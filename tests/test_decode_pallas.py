"""Fused Pallas decode-step kernel == XLA decode path (interpret mode, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_music_tpu.configs import ConditionerConfig, PriorConfig, VQVAEConfig
from vae_music_tpu.models.prior import FMHAPrior
from vae_music_tpu.sample.decode import SampleMode, make_decode_fn
from vae_music_tpu.train.prior_step import init_prior


def _vqvae_cfg():
    return VQVAEConfig(
        sample_length=1024, levels=2, latent_dim=8, codebook_size=16,
        down_depth=(3, 2), strides=(2, 2), residual_width=8, residual_depth=2,
        dilation_factor=3, use_spectral_loss=False,
    ).validate()


@pytest.mark.parametrize("level,cond", [(1, False), (0, True)])
@pytest.mark.slow
def test_fused_decode_matches_xla_path(level, cond):
    vcfg = _vqvae_cfg()
    pcfg = PriorConfig(
        level=level, levels=2, bins=17, width=32, depth=3, heads=2, blocks=4,
        attn_stacks=1, dropout=0.0, genre_classes=10,
        conditioner=ConditionerConfig(residual_depth=2) if cond else None)
    model, params = init_prior(jax.random.PRNGKey(1), vcfg, pcfg)
    ctx = vcfg.z_lengths[level]
    n = 2
    y_cond = model.apply(params, jnp.array([1, 2]), method=FMHAPrior.embed_labels)
    x_cond = None
    if cond:
        z_cond = jax.random.randint(jax.random.PRNGKey(3), (n, ctx // 4), 0, 16)
        x_cond = model.apply(params, z_cond, method=FMHAPrior.upsample_cond)

    dec_xla = make_decode_fn(pcfg, ctx, n, mode=SampleMode.GREEDY,
                             return_logits=True, fused=False)
    dec_fused = make_decode_fn(pcfg, ctx, n, mode=SampleMode.GREEDY,
                               return_logits=True, fused=True,
                               fused_interpret=True)
    tok_x, log_x = dec_xla(params, jax.random.PRNGKey(2), x_cond, y_cond)
    tok_f, log_f = dec_fused(params, jax.random.PRNGKey(2), x_cond, y_cond)
    np.testing.assert_array_equal(np.asarray(tok_x), np.asarray(tok_f))
    np.testing.assert_allclose(np.asarray(log_x), np.asarray(log_f),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("level,cond", [(1, False), (0, True)])
def test_fused_sample_in_kernel_greedy_matches_xla(level, cond):
    """The fully-fused step (head + sampling + next-embed inside the kernel)
    must reproduce the XLA scan body token-for-token under greedy sampling
    (deterministic, so exact equality is the bar)."""
    vcfg = _vqvae_cfg()
    pcfg = PriorConfig(
        level=level, levels=2, bins=17, width=32, depth=3, heads=2, blocks=4,
        attn_stacks=1, dropout=0.0, genre_classes=10,
        conditioner=ConditionerConfig(residual_depth=2) if cond else None)
    model, params = init_prior(jax.random.PRNGKey(1), vcfg, pcfg)
    ctx = vcfg.z_lengths[level]
    n = 2
    y_cond = model.apply(params, jnp.array([1, 2]), method=FMHAPrior.embed_labels)
    x_cond = None
    if cond:
        z_cond = jax.random.randint(jax.random.PRNGKey(3), (n, ctx // 4), 0, 16)
        x_cond = model.apply(params, z_cond, method=FMHAPrior.upsample_cond)

    dec_xla = make_decode_fn(pcfg, ctx, n, mode=SampleMode.GREEDY, fused=False)
    dec_fused = make_decode_fn(pcfg, ctx, n, mode=SampleMode.GREEDY,
                               fused=True, fused_interpret=True,
                               sample_in_kernel=True)
    tok_x = dec_xla(params, jax.random.PRNGKey(2), x_cond, y_cond)
    tok_f = dec_fused(params, jax.random.PRNGKey(2), x_cond, y_cond)
    np.testing.assert_array_equal(np.asarray(tok_x), np.asarray(tok_f))


def test_fused_sample_in_kernel_gumbel_smoke():
    """Gumbel sampling inside the kernel uses the TPU hardware PRNG (only the
    TPU interpreter implements it off-device): tokens must be valid code ids
    — the -1e9 head padding means a padded bin can never win the argmax."""
    vcfg = _vqvae_cfg()
    pcfg = PriorConfig(level=1, levels=2, bins=17, width=32, depth=3, heads=2,
                       blocks=4, attn_stacks=1, dropout=0.0)
    _, params = init_prior(jax.random.PRNGKey(1), vcfg, pcfg)
    ctx = vcfg.z_lengths[1]
    dec = make_decode_fn(pcfg, ctx, 2, mode=SampleMode.GUMBEL, fused=True,
                         fused_interpret="tpu", sample_in_kernel=True)
    tok = np.asarray(dec(params, jax.random.PRNGKey(2), None, None))
    assert tok.shape == (2, ctx + 1)
    assert tok[:, 0].tolist() == [16, 16]          # start token echoed
    assert (tok[:, 1:] >= 0).all() and (tok[:, 1:] < 17).all()
    assert len(np.unique(tok[:, 1:])) > 1          # actually sampling


def test_lane_tiled_kernel_matches_untiled():
    """lane_tiles=2 splits the attention lane axis into two tiles (bounded
    VMEM scratch for big batches); all lane math is elementwise across lanes,
    so outputs must be bit-comparable to the untiled kernel (after mapping
    the tile-major cache layouts back to a common logical layout)."""
    from vae_music_tpu.ops.decode_pallas import (fused_decode_step,
                                                 tile_cache, untile_cache)

    depth, n, heads, hd, width, blocks, block_len = 3, 4, 2, 8, 16, 4, 8
    patterns = (0, 1, 2)  # row, col, prev_row
    nh, hh = n * heads, heads * hd
    ks = jax.random.split(jax.random.PRNGKey(0), 16)
    weights = (
        jax.random.normal(ks[0], (depth, 3, width, 3 * hh)) * 0.3,
        jax.random.normal(ks[1], (depth, 3 * hh)) * 0.1,
        jax.random.normal(ks[2], (depth, hh, width)) * 0.3,
        jax.random.normal(ks[3], (depth, width)) * 0.1,
        jnp.ones((depth, width)), jnp.zeros((depth, width)),   # ln1
        jnp.ones((depth, width)), jnp.zeros((depth, width)),   # ln2
        jax.random.normal(ks[4], (depth, width, width)) * 0.3,
        jax.random.normal(ks[5], (depth, width)) * 0.1,
    )
    x = jax.random.normal(ks[6], (n, width))
    uc = jax.random.normal(ks[7], (depth, n, 2, width))
    kc = jax.random.normal(ks[8], (depth, blocks, block_len, hd, nh))
    vc = jax.random.normal(ks[9], (depth, blocks, block_len, hd, nh))
    # mid-sequence position: t = 2*block_len + 3 (block 2, offset 3 derived
    # in-kernel)
    scalars = jnp.array([[2 * block_len + 3]], jnp.int32)

    kw = dict(depth=depth, n=n, heads=heads, hd=hd, width=width,
              blocks=blocks, block_len=block_len, patterns=patterns,
              interpret=True)
    out1 = fused_decode_step(scalars, x, uc, tile_cache(kc, 1),
                             tile_cache(vc, 1), weights, lane_tiles=1, **kw)
    out2 = fused_decode_step(scalars, x, uc, tile_cache(kc, 2),
                             tile_cache(vc, 2), weights, lane_tiles=2, **kw)
    # Round-trip check on the layout helpers themselves.
    np.testing.assert_array_equal(np.asarray(untile_cache(tile_cache(kc, 2))),
                                  np.asarray(kc))
    out1 = out1[:2] + tuple(untile_cache(c) for c in out1[2:])
    out2 = out2[:2] + tuple(untile_cache(c) for c in out2[2:])
    for a, b, name in zip(out1, out2, ("x", "uc", "kc", "vc")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6, err_msg=name)


def test_auto_lane_tiles_alignment():
    """The tile chooser must handle non-power-of-2 lane counts (nh=384 once
    blew scoped VMEM because only power-of-2 splits were tried) and always
    return 128-lane-aligned tiles within the scratch budget."""
    from vae_music_tpu.ops.decode_pallas import LANE, _auto_lane_tiles

    for nh in (128, 256, 384, 512, 640, 768, 1024, 2048):
        for cache_bytes in (2, 4):
            for hist_slots in (2, 3, 4):
                t = _auto_lane_tiles(nh, 224, 16, cache_bytes, 4, hist_slots)
                assert nh % t == 0 and (nh // t) % LANE == 0, (
                    nh, cache_bytes, t)
                scratch = ((2 * hist_slots * 224 + 4 * 4) * 16
                           * (nh // t) * cache_bytes)
                # within budget unless even maximal tiling cannot fit
                assert scratch <= 8 * 1024 * 1024 or nh // t == LANE
    # the flagship serving geometry keeps its measured sweet-spot choice:
    # 4 tiles at the 3-slot production default (decode_lab: 41.9 us/step),
    # 2 at the shallower 2-slot pipeline (43.5).
    assert _auto_lane_tiles(512, 224, 16, 2, 4) == 4
    assert _auto_lane_tiles(512, 224, 16, 2, 4, hist_slots=2) == 2


def test_int8_cache_kernel_matches_f32_on_dequantized_history():
    """int8 KV caches with per-(position, lane) scales: the kernel factors the
    scale out of both attention reductions.  With POWER-OF-TWO scales this
    factoring is bit-exact (multiplying a f32 by 2^k commutes with rounding),
    so the int8 kernel fed (int8 values, scales) must match the f32 kernel fed
    the dequantized history to float-associativity tolerance — a wiring-exact
    check of the scale math across all three patterns (row/col/prev_row)."""
    from vae_music_tpu.ops.decode_pallas import (
        SCALE_DTYPE, decode_scale_cache_shape, fused_decode_step, tile_cache)

    depth, n, heads, hd, width, blocks, block_len = 3, 4, 2, 8, 16, 4, 8
    patterns = (0, 1, 2)
    nh, hh = n * heads, heads * hd
    lt = 1
    ks_ = jax.random.split(jax.random.PRNGKey(7), 16)
    weights = (
        jax.random.normal(ks_[0], (depth, 3, width, 3 * hh)) * 0.3,
        jax.random.normal(ks_[1], (depth, 3 * hh)) * 0.1,
        jax.random.normal(ks_[2], (depth, hh, width)) * 0.3,
        jax.random.normal(ks_[3], (depth, width)) * 0.1,
        jnp.ones((depth, width)), jnp.zeros((depth, width)),
        jnp.ones((depth, width)), jnp.zeros((depth, width)),
        jax.random.normal(ks_[4], (depth, width, width)) * 0.3,
        jax.random.normal(ks_[5], (depth, width)) * 0.1,
    )
    x = jax.random.normal(ks_[6], (n, width))
    uc = jax.random.normal(ks_[7], (depth, n, 2, width))
    rng = np.random.default_rng(0)
    kc_i = rng.integers(-127, 128, (depth, blocks, block_len, hd, nh))
    vc_i = rng.integers(-127, 128, (depth, blocks, block_len, hd, nh))
    ksc = 2.0 ** rng.integers(-3, 2, (depth, blocks, block_len, 1, nh))
    vsc = 2.0 ** rng.integers(-3, 2, (depth, blocks, block_len, 1, nh))
    kc_q = jnp.asarray(kc_i, jnp.int8)
    vc_q = jnp.asarray(vc_i, jnp.int8)
    ksc_b = jnp.asarray(ksc, SCALE_DTYPE)
    vsc_b = jnp.asarray(vsc, SCALE_DTYPE)
    kc_f = kc_q.astype(jnp.float32) * ksc_b.astype(jnp.float32)
    vc_f = vc_q.astype(jnp.float32) * vsc_b.astype(jnp.float32)

    t = 2 * block_len + 3          # block 2, offset 3: all patterns active
    scalars = jnp.array([[t]], jnp.int32)
    kw = dict(depth=depth, n=n, heads=heads, hd=hd, width=width,
              blocks=blocks, block_len=block_len, patterns=patterns,
              interpret=True, lane_tiles=lt)
    out_f = fused_decode_step(scalars, x, uc, tile_cache(kc_f, lt),
                              tile_cache(vc_f, lt), weights, **kw)
    assert decode_scale_cache_shape(depth, blocks, block_len, nh, lt) == (
        tile_cache(ksc_b, lt).shape)
    out_q = fused_decode_step(scalars, x, uc, tile_cache(kc_q, lt),
                              tile_cache(vc_q, lt), weights,
                              kscale=tile_cache(ksc_b, lt),
                              vscale=tile_cache(vsc_b, lt), **kw)
    assert len(out_q) == 6
    np.testing.assert_allclose(np.asarray(out_q[0]), np.asarray(out_f[0]),
                               rtol=1e-6, atol=1e-6, err_msg="x_out")
    np.testing.assert_allclose(np.asarray(out_q[1]), np.asarray(out_f[1]),
                               rtol=1e-6, atol=1e-6, err_msg="uc_out")
    # The written current-position k/v: dequantized int8 entries must sit
    # within half a quantization step (+bf16 scale rounding) of the f32
    # kernel's stored values, layer by layer.
    b, i = t // block_len, t % block_len
    for name, qc, sc, fc in (("k", out_q[2], out_q[4], out_f[2]),
                             ("v", out_q[3], out_q[5], out_f[3])):
        got = (np.asarray(qc)[:, :, b, i].astype(np.float32)
               * np.asarray(sc)[:, :, b, i].astype(np.float32))
        ref = np.asarray(fc)[:, :, b, i]
        step = np.asarray(sc)[:, :, b, i].astype(np.float32)
        assert (np.abs(got - ref) <= 0.51 * step + 1e-6).all(), name


def test_int8_cache_decode_end_to_end_close_to_f32():
    """Greedy decode with cache_dtype='int8' through make_decode_fn: the
    quantization error must stay small enough that the tiny test prior's
    token stream barely diverges from the f32-cache fused path (wiring test
    of the scale caches through the scan carry)."""
    vcfg = _vqvae_cfg()
    pcfg = PriorConfig(level=1, levels=2, bins=17, width=32, depth=3, heads=2,
                       blocks=4, attn_stacks=1, dropout=0.0)
    _, params = init_prior(jax.random.PRNGKey(1), vcfg, pcfg)
    ctx = vcfg.z_lengths[1]
    dec_f32 = make_decode_fn(pcfg, ctx, 2, mode=SampleMode.GREEDY,
                             return_logits=True, fused=True,
                             fused_interpret=True)
    dec_int8 = make_decode_fn(pcfg, ctx, 2, mode=SampleMode.GREEDY,
                              return_logits=True, fused=True,
                              fused_interpret=True, cache_dtype="int8")
    tok_f, log_f = dec_f32(params, jax.random.PRNGKey(2), None, None)
    tok_q, log_q = dec_int8(params, jax.random.PRNGKey(2), None, None)
    agree = np.mean(np.asarray(tok_f) == np.asarray(tok_q))
    assert agree >= 0.9, agree
    # per-step logits stay close until the first token divergence
    diff = np.abs(np.asarray(log_f[:, :8]) - np.asarray(log_q[:, :8]))
    assert diff.max() < 0.25, diff.max()


def test_int8_cache_sample_in_kernel_close_to_f32():
    """The fully-fused sampled step must thread the int8 scale caches through
    its scan carry too: greedy in-kernel sampling with int8 caches stays
    token-close to the f32-cache in-kernel path."""
    vcfg = _vqvae_cfg()
    pcfg = PriorConfig(level=1, levels=2, bins=17, width=32, depth=3, heads=2,
                       blocks=4, attn_stacks=1, dropout=0.0)
    _, params = init_prior(jax.random.PRNGKey(1), vcfg, pcfg)
    ctx = vcfg.z_lengths[1]
    dec_f32 = make_decode_fn(pcfg, ctx, 2, mode=SampleMode.GREEDY, fused=True,
                             fused_interpret=True, sample_in_kernel=True)
    dec_int8 = make_decode_fn(pcfg, ctx, 2, mode=SampleMode.GREEDY, fused=True,
                              fused_interpret=True, sample_in_kernel=True,
                              cache_dtype="int8")
    tok_f = np.asarray(dec_f32(params, jax.random.PRNGKey(2), None, None))
    tok_q = np.asarray(dec_int8(params, jax.random.PRNGKey(2), None, None))
    agree = np.mean(tok_f == tok_q)
    assert agree >= 0.9, agree


def test_kth_largest_threshold_exact():
    """The sort-free int-bisection threshold == jnp.sort's k-th largest,
    bit-for-bit, including ties, negatives, and -1e9 padding bins."""
    from vae_music_tpu.ops.decode_pallas import kth_largest_threshold

    rng = np.random.default_rng(0)
    scores = rng.normal(scale=7.0, size=(16, 640)).astype(np.float32)
    scores[:, 600:] = -1e9                      # padded head bins
    scores[3, 5] = scores[3, 17]                # exact tie
    scores[4, :] = -2.5                         # all-equal row
    s = jnp.asarray(scores)
    for k in (1, 2, 7, 40, 600):
        ref = np.sort(scores, axis=-1)[:, -k][:, None]
        got = np.asarray(kth_largest_threshold(s, k))
        np.testing.assert_array_equal(got, ref, err_msg=f"k={k}")


def test_fused_sample_in_kernel_top_k_one_matches_greedy():
    """top_k=1 in-kernel must be token-exact vs the greedy control: only the
    argmax survives the threshold mask, so the Gumbel noise cannot flip it
    (the VERDICT r2 #6 'token-exact-vs-XLA at fixed RNG' gate)."""
    vcfg = _vqvae_cfg()
    pcfg = PriorConfig(level=1, levels=2, bins=17, width=32, depth=3, heads=2,
                       blocks=4, attn_stacks=1, dropout=0.0)
    _, params = init_prior(jax.random.PRNGKey(1), vcfg, pcfg)
    ctx = vcfg.z_lengths[1]
    dec_greedy = make_decode_fn(pcfg, ctx, 2, mode=SampleMode.GREEDY,
                                fused=False)
    dec_topk = make_decode_fn(pcfg, ctx, 2, mode=SampleMode.TOP_K, top_k=1,
                              fused=True, fused_interpret="tpu",
                              sample_in_kernel=True)
    tok_g = np.asarray(dec_greedy(params, jax.random.PRNGKey(2), None, None))
    tok_k = np.asarray(dec_topk(params, jax.random.PRNGKey(2), None, None))
    np.testing.assert_array_equal(tok_g, tok_k)


def test_fused_sample_in_kernel_top_k_respects_set():
    """Every in-kernel top-k token must come from that step's top-k set of
    the XLA teacher-forced logits (checked post-hoc by re-scoring the
    sampled prefix with the full forward), and sampling must be nontrivial
    (k > 1 produces more than the greedy token)."""
    from vae_music_tpu.models.prior import build_fmha_prior

    vcfg = _vqvae_cfg()
    pcfg = PriorConfig(level=1, levels=2, bins=17, width=32, depth=3, heads=2,
                       blocks=4, attn_stacks=1, dropout=0.0)
    model = build_fmha_prior(vcfg, pcfg)
    _, params = init_prior(jax.random.PRNGKey(1), vcfg, pcfg)
    ctx = vcfg.z_lengths[1]
    k = 3
    dec = make_decode_fn(pcfg, ctx, 2, mode=SampleMode.TOP_K, top_k=k,
                         fused=True, fused_interpret="tpu",
                         sample_in_kernel=True)
    tok = np.asarray(dec(params, jax.random.PRNGKey(3), None, None))
    # teacher-force the sampled sequence to recover each step's logits
    logits, _ = model.apply(params, jnp.asarray(tok[:, :-1]), None, None,
                            train=False)
    logits = np.asarray(logits)
    for b in range(tok.shape[0]):
        for t in range(ctx):
            row = logits[b, t]
            kth = np.sort(row)[-k]
            assert row[tok[b, t + 1]] >= kth, (b, t)
