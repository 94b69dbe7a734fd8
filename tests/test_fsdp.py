"""FSDP (ZeRO-3-style) sharded prior training.

Checks, on the 8-device virtual CPU mesh:
  * the FSDP step's loss AND updated parameters match the single-device
    step exactly (same function jitted — only placements differ);
  * parameters and Adam moments are genuinely sharded (each device holds
    1/8th of every large leaf), i.e. the memory win is real;
  * FSDP composes with tensor parallelism (TP kernels keep their 'model'
    axis; FSDP occupies a different dimension).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vae_music_tpu.configs import ConditionerConfig, PriorConfig, VQVAEConfig
from vae_music_tpu.models.vqvae import init_vqvae
from vae_music_tpu.parallel.fsdp import (
    fsdp_sharding,
    make_prior_train_step_fsdp,
    shard_state,
)
from vae_music_tpu.parallel.mesh import create_mesh
from vae_music_tpu.parallel.sharding import prior_param_sharding
from vae_music_tpu.train.prior_step import (
    init_prior,
    make_prior_train_step,
)
from vae_music_tpu.train.state import PriorTrainState

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices")


def _setup():
    vcfg = VQVAEConfig(
        sample_length=512, levels=2, latent_dim=8, codebook_size=16,
        down_depth=(3, 2), strides=(2, 2), residual_width=8, residual_depth=1,
        dilation_factor=3, use_spectral_loss=False,
    ).validate()
    pcfg = PriorConfig(
        level=0, levels=2, bins=17, width=64, depth=2, heads=2, blocks=4,
        attn_stacks=1, dropout=0.0, genre_classes=10,
        conditioner=ConditionerConfig(residual_depth=1))
    rng = jax.random.PRNGKey(0)
    vq_params, cbs = init_vqvae(rng, vcfg)
    _, prior_params = init_prior(rng, vcfg, pcfg)
    audio = jnp.asarray(np.random.default_rng(0).standard_normal(
        (8, vcfg.sample_length, 1)), jnp.float32)
    labels = jnp.zeros((8,), jnp.int32)
    return vcfg, pcfg, vq_params, cbs, prior_params, audio, labels


def test_fsdp_step_matches_single_device():
    vcfg, pcfg, vq_params, cbs, prior_params, audio, labels = _setup()
    rng = jax.random.PRNGKey(7)
    # SGD for the param-equality check: the K-projection biases are softmax-
    # invariant (adding a constant to every key shifts each query's scores
    # uniformly), so their gradients are pure accumulation-order noise —
    # Adam's first step turns that noise into +-lr*sign(noise), which differs
    # between the sharded and single-device reductions.  Under SGD noise
    # stays at noise scale.  (Adam placement is covered by the test below.)
    tx = optax.sgd(1e-2)

    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    state, shardings = shard_state(
        mesh, PriorTrainState.create(prior_params, tx))
    fsdp_step = make_prior_train_step_fsdp(
        vcfg, pcfg, vq_params, cbs, mesh, shardings, donate=False)
    ref_step = make_prior_train_step(vcfg, pcfg, vq_params, cbs, donate=False)
    ref_state = PriorTrainState.create(prior_params, tx)

    for i in range(2):
        state, m = fsdp_step(state, audio, labels, rng)
        ref_state, rm = ref_step(ref_state, audio, labels, rng)
        np.testing.assert_allclose(float(m["loss"]), float(rm["loss"]),
                                   rtol=1e-5)

    # Updated parameters match leaf-for-leaf after two optimizer steps.
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6),
        state.params, ref_state.params)


def test_fsdp_state_is_actually_sharded():
    vcfg, pcfg, vq_params, cbs, prior_params, audio, labels = _setup()
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    state, shardings = shard_state(
        mesh, PriorTrainState.create(prior_params, optax.adam(1e-3)))

    def shard_frac(leaf):
        if leaf.ndim == 0 or leaf.size < 1024:
            return 1.0
        local = leaf.addressable_shards[0].data.size
        return local / leaf.size

    # Every large parameter leaf is split 8 ways...
    fracs = [shard_frac(l) for l in jax.tree_util.tree_leaves(state.params)
             if l.size >= 1024]
    assert fracs and all(abs(f - 1 / 8) < 1e-9 for f in fracs)
    # ...and so are its Adam moments (the ZeRO win: no replicated slots).
    opt_fracs = [shard_frac(l)
                 for l in jax.tree_util.tree_leaves(state.opt_state)
                 if hasattr(l, "size") and l.size >= 1024]
    assert opt_fracs and all(abs(f - 1 / 8) < 1e-9 for f in opt_fracs)

    # The step still runs and the output state keeps the sharded placement.
    step = make_prior_train_step_fsdp(vcfg, pcfg, vq_params, cbs, mesh,
                                      shardings, donate=False)
    new_state, _ = step(state, audio, labels, jax.random.PRNGKey(0))
    big = [l for l in jax.tree_util.tree_leaves(new_state.params)
           if l.size >= 1024][0]
    assert big.addressable_shards[0].data.size == big.size // 8


def test_fsdp_composes_with_tensor_parallel():
    vcfg, pcfg, vq_params, cbs, prior_params, audio, labels = _setup()
    mesh = create_mesh((4, 2), devices=jax.devices()[:8])  # data x model
    tp = prior_param_sharding(mesh, prior_params)
    fs = fsdp_sharding(mesh, prior_params, axis="data", base=tp)

    tp_leaves = jax.tree_util.tree_leaves(tp)
    fs_leaves = jax.tree_util.tree_leaves(fs)
    kept_model = 0
    added_data = 0
    for t, f in zip(tp_leaves, fs_leaves):
        t_axes = [a for a in (t.spec or ()) if a is not None]
        f_axes = [a for a in (f.spec or ()) if a is not None]
        assert set(t_axes) <= set(f_axes)  # TP axes preserved
        kept_model += "model" in f_axes
        added_data += "data" in f_axes
    assert kept_model > 0 and added_data > 0

    # And the composed placement trains: loss matches single-device.
    tx = optax.sgd(1e-2)
    st = PriorTrainState.create(prior_params, tx)
    st, shardings = shard_state(mesh, st, base_params=tp)
    step = make_prior_train_step_fsdp(vcfg, pcfg, vq_params, cbs, mesh,
                                      shardings, donate=False)
    _, m = step(st, audio, labels, jax.random.PRNGKey(0))
    ref = make_prior_train_step(vcfg, pcfg, vq_params, cbs, donate=False)
    _, rm = ref(PriorTrainState.create(prior_params, tx), audio, labels,
                jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(m["loss"]), float(rm["loss"]), rtol=1e-5)


def test_fsdp_adam_moments_match_param_placement_by_path():
    """With TP base shardings + Adam, every mu/nu moment gets EXACTLY its
    parameter's (TP x FSDP) placement — matched by tree path, not shape
    (r3 review fix: two same-shape params with different TP placements must
    not share a moment sharding, or jit reshards the moments every step)."""
    vcfg, pcfg, vq_params, cbs, prior_params, audio, labels = _setup()
    mesh = create_mesh((4, 2), devices=jax.devices()[:8])  # data x model
    tp = prior_param_sharding(mesh, prior_params)

    st = PriorTrainState.create(prior_params, optax.adam(1e-3))
    st, shardings = shard_state(mesh, st, base_params=tp)

    flat_p = {tuple(str(k) for k in path): sh
              for path, sh in jax.tree_util.tree_flatten_with_path(
                  shardings.params)[0]}
    lens = sorted({len(k) for k in flat_p}, reverse=True)
    matched = mismatched = 0
    for path, sh in jax.tree_util.tree_flatten_with_path(
            shardings.opt_state)[0]:
        pk = tuple(str(k) for k in path)
        for n in lens:
            want = flat_p.get(pk[-n:]) if len(pk) >= n else None
            if want is not None:
                matched += 1
                mismatched += want != sh
                break
    assert matched > 0 and mismatched == 0
    # At least one moment actually carries the TP 'model' axis.
    assert any("model" in [a for a in (sh.spec or ()) if a is not None]
               for _, sh in jax.tree_util.tree_flatten_with_path(
                   shardings.opt_state)[0])

    # The Adam+TP+FSDP step runs and keeps the sharded placement.
    step = make_prior_train_step_fsdp(vcfg, pcfg, vq_params, cbs, mesh,
                                      shardings, donate=False)
    new_st, _ = step(st, audio, labels, jax.random.PRNGKey(0))
    for got, want in zip(jax.tree_util.tree_leaves(new_st.opt_state),
                         jax.tree_util.tree_leaves(shardings.opt_state)):
        if hasattr(got, "sharding"):
            assert got.sharding == want
