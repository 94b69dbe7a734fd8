"""Multi-device tests on the 8-device virtual CPU mesh (SURVEY.md §4):
DP+TP dryrun, and sequence-parallel (block-axis) sharding of the factorized
attention via GSPMD."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vae_music_tpu.nn.attention import FactorizedAttention
import pytest


@pytest.mark.slow
def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_factorized_attention_sequence_sharded():
    """Long-context story (SURVEY.md §5): the (blocks, block_len) grid makes
    the sequence shardable — row/prev_row stay block-local, col becomes a
    collective.  GSPMD must produce identical outputs for a sequence-sharded
    input."""
    mesh = Mesh(np.array(jax.devices()).reshape(8, 1), ("data", "model"))
    for attn_func in (0, 1, 2):
        m = FactorizedAttention(ctx_len=64, num_heads=2, d_model=16, blocks=8,
                                attn_func=attn_func)
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 64, 16))
        params = m.init(jax.random.PRNGKey(1), x)
        f = jax.jit(lambda p, x: m.apply(p, x))
        ref = f(params, x)
        # Shard the sequence (time) axis across 8 devices.
        xs = jax.device_put(x, NamedSharding(mesh, P(None, "data", None)))
        out = f(params, xs)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def test_prior_tp_sharded_forward_matches():
    """Column-parallel prior kernels over the 'model' axis give identical
    logits to the replicated forward."""
    from vae_music_tpu.configs import PriorConfig, VQVAEConfig
    from vae_music_tpu.parallel.sharding import prior_param_sharding
    from vae_music_tpu.train.prior_step import init_prior

    vcfg = VQVAEConfig(sample_length=512, levels=1, latent_dim=8, codebook_size=16,
                       down_depth=(3,), strides=(2,), residual_width=8,
                       residual_depth=1, dilation_factor=3,
                       use_spectral_loss=False).validate()
    pcfg = PriorConfig(level=0, levels=1, bins=17, width=32, depth=2, heads=2,
                       blocks=4, attn_stacks=1, dropout=0.0, genre_classes=None)
    model, params = init_prior(jax.random.PRNGKey(0), vcfg, pcfg)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (4, 64), 0, 16)

    f = jax.jit(lambda p, t: model.apply(p, t)[0])
    ref = f(params, tokens)

    mesh = Mesh(np.array(jax.devices()).reshape(4, 2), ("data", "model"))
    shardings = prior_param_sharding(mesh, params)
    params_tp = jax.tree_util.tree_map(jax.device_put, params, shardings)
    tokens_dp = jax.device_put(tokens, NamedSharding(mesh, P("data")))
    out = f(params_tp, tokens_dp)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_put_global_batch_process_local_path():
    """Multi-host input sharding helper (SURVEY.md §2.2 'per-host input
    sharding'): the make_array_from_process_local_data path must produce the
    same global array + sharding as plain device_put on one process, and a
    sharded train step must accept it."""
    from vae_music_tpu.parallel.input import (
        host_local_rows,
        host_local_slice,
        put_global_batch,
    )
    from vae_music_tpu.parallel.mesh import batch_sharding, create_mesh

    mesh = create_mesh()
    sharding = batch_sharding(mesh)
    x = np.random.default_rng(0).standard_normal((16, 32, 1)).astype(np.float32)

    a = put_global_batch(x, sharding)                            # device_put
    b = put_global_batch(x, sharding, use_process_local=True)    # multi-host path
    assert a.shape == b.shape == (16, 32, 1)
    assert b.sharding.is_equivalent_to(sharding, 3)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # helpers: equal split + disjoint cover of the epoch
    assert host_local_rows(16) == 16  # single process owns the whole batch
    sl0 = host_local_slice(100, seed=7, epoch=3)
    assert sl0.shape == (100,)
    assert sorted(sl0.tolist()) == list(range(100))

    # a jitted global-batch reduction consumes the assembled array
    out = jax.jit(lambda v: v.sum())(b)
    np.testing.assert_allclose(float(out), x.sum(), rtol=1e-5)


def test_sharded_serving_chain_matches_per_shard():
    """DP serving (compile_chain_sharded): the batch-sharded ancestral chain
    must equal running each shard's local chain with that shard's folded RNG
    — generation is embarrassingly parallel, so sharding may not change a
    single sample."""
    from vae_music_tpu.configs import SamplerConfig, VQVAEConfig
    from vae_music_tpu.sample.sampler import AncestralSampler

    vcfg = VQVAEConfig(
        sample_length=512, levels=2, latent_dim=8, codebook_size=16,
        down_depth=(3, 2), strides=(2, 2), residual_width=8, residual_depth=1,
        dilation_factor=3, use_spectral_loss=False,
    ).validate()
    scfg = SamplerConfig(vqvae=vcfg, prior_width=16, prior_depth=2,
                         prior_heads=2, prior_blocks=4, genre_classes=10)
    sampler = AncestralSampler.from_config(scfg, jax.random.PRNGKey(0))

    n_dev = 8
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("data",))
    n = 2 * n_dev
    rng = jax.random.PRNGKey(3)
    y = jnp.arange(n, dtype=jnp.int32) % 10

    sharded = sampler.compile_chain_sharded(n, mesh)
    wav = sharded(rng, jax.device_put(y, NamedSharding(mesh, P("data"))))
    assert wav.shape == (n, vcfg.sample_length, 1)
    assert wav.sharding.is_equivalent_to(NamedSharding(mesh, P("data")), 3)

    local = sampler.compile_chain(n // n_dev)
    per_shard = [
        np.asarray(local(jax.random.fold_in(rng, d),
                         y[d * 2:(d + 1) * 2]))
        for d in range(n_dev)
    ]
    np.testing.assert_allclose(np.asarray(wav), np.concatenate(per_shard),
                               rtol=1e-5, atol=1e-6)


def test_sharded_serving_chain_unlabeled():
    """with_labels=False variant of the sharded chain (rng-only signature)."""
    from vae_music_tpu.configs import SamplerConfig, VQVAEConfig
    from vae_music_tpu.sample.sampler import AncestralSampler

    vcfg = VQVAEConfig(
        sample_length=512, levels=2, latent_dim=8, codebook_size=16,
        down_depth=(3, 2), strides=(2, 2), residual_width=8, residual_depth=1,
        dilation_factor=3, use_spectral_loss=False,
    ).validate()
    scfg = SamplerConfig(vqvae=vcfg, prior_width=16, prior_depth=2,
                         prior_heads=2, prior_blocks=4)
    sampler = AncestralSampler.from_config(scfg, jax.random.PRNGKey(0))
    mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
    fn = sampler.compile_chain_sharded(8, mesh, with_labels=False)
    wav = fn(jax.random.PRNGKey(1))
    assert wav.shape == (8, vcfg.sample_length, 1)
    assert np.isfinite(np.asarray(wav)).all()


def test_host_local_slice_covers_remainder(monkeypatch):
    """Pin the non-divisible-epoch semantics (ADVICE r2: the remainder was
    silently dropped): with n_examples % process_count != 0 every process
    still yields ceil(n/p) rows, the union covers every example at least
    once, and duplicates come from the front of the shared permutation."""
    from vae_music_tpu.parallel import input as pin

    n, n_proc = 103, 8
    monkeypatch.setattr(jax, "process_count", lambda: n_proc)
    per = -(-n // n_proc)
    chunks = []
    for i in range(n_proc):
        monkeypatch.setattr(jax, "process_index", lambda i=i: i)
        sl = pin.host_local_slice(n, seed=7, epoch=3)
        assert sl.shape == (per,)          # equal rows -> collective-safe
        chunks.append(sl)
    seen = np.concatenate(chunks)
    assert sorted(set(seen.tolist())) == list(range(n))   # full coverage
    assert len(seen) == per * n_proc                      # 1 dup per tail row
    # identical permutation on every "host": chunks are reproducible
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    np.testing.assert_array_equal(chunks[0],
                                  pin.host_local_slice(n, seed=7, epoch=3))


def test_tp_decode_matches_single_device():
    """Tensor-parallel decode (parallel/tp_decode.py): KV caches + attention
    weights head-sharded over a 'model' mesh, one psum per layer — logits
    and greedy tokens must match the single-device XLA scan path.  This is
    the capacity lever for wide-geometry serving (the 12 GB batch-64 cache
    splits over the axis; docs/SERVING.md wide row)."""
    import dataclasses

    import numpy as np
    from jax.sharding import Mesh

    from vae_music_tpu.configs import PriorConfig, get_config
    from vae_music_tpu.models.prior import FMHAPrior, build_fmha_prior
    from vae_music_tpu.parallel.tp_decode import make_decode_fn_tp
    from vae_music_tpu.sample.decode import SampleMode, make_decode_fn

    pcfg = PriorConfig(level=0, levels=1, bins=65, width=32, depth=6,
                       heads=4, blocks=4, attn_stacks=1, genre_classes=7)
    vcfg = dataclasses.replace(get_config("SMALL_VQ_VAE"), sample_length=1024)
    model = build_fmha_prior(vcfg, pcfg)
    ctx, n = 32, 3
    import jax.random as jr

    from vae_music_tpu.train.prior_step import init_prior

    _, params = init_prior(jr.PRNGKey(0), vcfg, pcfg)
    y_cond = model.apply(params, jnp.arange(1, n + 1),
                         method=FMHAPrior.embed_labels)
    mesh = Mesh(np.array(jax.devices()[:4]), ("model",))

    ref = make_decode_fn(pcfg, ctx, n, fused=False, mode=SampleMode.GREEDY,
                         return_logits=True)
    tp = make_decode_fn_tp(pcfg, ctx, n, mesh, mode=SampleMode.GREEDY,
                           return_logits=True)
    t0, l0 = ref(params, jr.PRNGKey(7), None, y_cond)
    t1, l1 = tp(params, jr.PRNGKey(7), None, y_cond)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l0),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
