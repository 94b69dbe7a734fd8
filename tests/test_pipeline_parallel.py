"""Pipeline parallelism: GPipe schedule over 'pipe' mesh axis equals the
single-device FactorizedTransformer forward, and is differentiable."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from vae_music_tpu.nn.transformer import FactorizedTransformer
from vae_music_tpu.parallel.pipeline import (
    pipeline_transformer_apply,
    stack_layer_params,
    unstack_layer_params,
)

DEPTH = 4


def _setup(attn_stacks=1):
    tf = FactorizedTransformer(ctx_len=32, num_heads=2, depth=DEPTH,
                               d_model=16, blocks=4, attn_stacks=attn_stacks,
                               dropout=0.0)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 32, 16))
    params = tf.init(jax.random.PRNGKey(0), x)["params"]
    ref, _ = tf.apply({"params": params}, x, train=False)
    return tf, params, x, ref


@pytest.mark.parametrize("n_stages,micro", [
    pytest.param(4, 4, marks=pytest.mark.slow),
    pytest.param(2, 8, marks=pytest.mark.slow), (4, 2)])
def test_pipeline_matches_single_device(n_stages, micro):
    tf, params, x, ref = _setup()
    mesh = Mesh(np.array(jax.devices()[:n_stages]), ("pipe",))
    stacked = stack_layer_params(params, DEPTH)
    out = pipeline_transformer_apply(tf, stacked, x, mesh=mesh,
                                     n_microbatches=micro)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_pipeline_row_col_schedule():
    """attn_stacks=0 (row/col cycle of 2) exercises the lax.switch pattern
    dispatch with a different cycle length."""
    tf, params, x, ref = _setup(attn_stacks=0)
    mesh = Mesh(np.array(jax.devices()[:2]), ("pipe",))
    stacked = stack_layer_params(params, DEPTH)
    out = pipeline_transformer_apply(tf, stacked, x, mesh=mesh,
                                     n_microbatches=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_pipeline_backward():
    """The pipelined forward is one differentiable XLA program: jax.grad
    through ppermute/scan gives PP training."""
    tf, params, x, _ = _setup()
    mesh = Mesh(np.array(jax.devices()[:4]), ("pipe",))
    stacked = stack_layer_params(params, DEPTH)

    def loss(sp):
        out = pipeline_transformer_apply(tf, sp, x, mesh=mesh,
                                         n_microbatches=4)
        return jnp.mean(out ** 2)

    def loss_ref(p):
        out, _ = tf.apply({"params": p}, x, train=False)
        return jnp.mean(out ** 2)

    g = jax.grad(loss)(stacked)
    g_ref = stack_layer_params(
        {k: v for k, v in jax.grad(loss_ref)(params).items()}, DEPTH)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-3, atol=1e-5),
        g, g_ref)


def test_stack_unstack_roundtrip():
    _, params, _, _ = _setup()
    stacked = stack_layer_params(params, DEPTH)
    back = unstack_layer_params(stacked, DEPTH)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        {f"layer_{i}": params[f"layer_{i}"] for i in range(DEPTH)}, back)
