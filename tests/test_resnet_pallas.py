"""Fused dilated-resnet Pallas kernel == the flax DilatedResnet1D stack.

SURVEY.md §7 stage 3b at serving widths: the kernel chains all L residual
blocks on a VMEM tile (halo trick).  Interpret mode on CPU pins exact
semantics: dilation chain, SAME zero padding at the global edges (including
the bias-ripple mask between blocks), tile-boundary halos, reversed
dilations, and non-divisible tail shapes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_music_tpu.nn.resnet import DilatedResnet1D
from vae_music_tpu.ops.resnet_pallas import (
    fused_dilated_resnet,
    stack_resnet_params,
)


def _setup(depth=4, c=32, t=448, n=4, factor=3, reverse=True, cycle=None,
           seed=0):
    mod = DilatedResnet1D(c, depth, dilation_factor=factor,
                          reverse_dilation=reverse, dilation_cycle=cycle,
                          conv_impl="conv")
    x = jax.random.normal(jax.random.PRNGKey(seed), (n, t, c))
    params = mod.init(jax.random.PRNGKey(seed + 1), x)["params"]
    ref = mod.apply({"params": params}, x)
    stacks = stack_resnet_params(params, depth)
    return mod, params, stacks, x, ref


@pytest.mark.parametrize("block_t", [448, 112])
def test_fused_resnet_matches_flax(block_t):
    """Whole-tile and multi-tile (halo-exercising) block sizes."""
    mod, _p, (w0, b0, w1, b1), x, ref = _setup()
    got = fused_dilated_resnet(x, w0, b0, w1, b1, mod.dilations(),
                               block_t=block_t, compute_dtype=jnp.float32,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_resnet_edge_zero_padding():
    """The inter-block global-edge mask: without re-zeroing, block l+1 reads
    block l's bias ripple where SAME padding demands zeros.  A small tile
    count puts the global edges inside halo reach of real outputs."""
    mod, _p, (w0, b0, w1, b1), x, ref = _setup(t=224, depth=3)
    got = fused_dilated_resnet(x, w0, b0, w1, b1, mod.dilations(),
                               block_t=56, compute_dtype=jnp.float32,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_resnet_forward_dilations_and_cycle():
    """Encoder-style (unreversed) dilations and the cyclic schedule used by
    the SMALL_UPSAMPLER conditioner (dilation_cycle)."""
    for kw in ({"reverse": False}, {"cycle": 2, "depth": 5}):
        mod, _p, (w0, b0, w1, b1), x, ref = _setup(t=224, **kw)
        got = fused_dilated_resnet(x, w0, b0, w1, b1, mod.dilations(),
                                   block_t=112, compute_dtype=jnp.float32,
                                   interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def test_fused_resnet_bf16_close():
    """bf16 compute (the serving configuration) stays within bf16 tolerance
    of the f32 flax stack."""
    mod, _p, (w0, b0, w1, b1), x, ref = _setup(t=224)
    got = fused_dilated_resnet(x, w0, b0, w1, b1, mod.dilations(),
                               block_t=112, compute_dtype=jnp.bfloat16,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0.1, atol=0.12)
