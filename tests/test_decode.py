"""KV-cached decode correctness — the framework's central invariant.

The decode-step-with-cache must reproduce the full-sequence forward exactly
(the TPU version of factorized_attention.py:446-462's incremental==batch test,
called out as the most important test to carry over in SURVEY.md §4.2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_music_tpu.configs import ConditionerConfig, PriorConfig, SamplerConfig, VQVAEConfig
from vae_music_tpu.models.prior import FMHAPrior, build_fmha_prior, level_spec
from vae_music_tpu.sample.decode import SampleMode, make_decode_fn, sample_token
from vae_music_tpu.sample.sampler import AncestralSampler
from vae_music_tpu.train.prior_step import init_prior


def _vqvae_cfg():
    return VQVAEConfig(
        sample_length=1024, levels=2, latent_dim=8, codebook_size=16,
        down_depth=(3, 2), strides=(2, 2), residual_width=8, residual_depth=2,
        dilation_factor=3, use_spectral_loss=False,
    ).validate()


def _prior_cfg(level, cond=False, **kw):
    kw.setdefault("attn_stacks", 1)
    kw.setdefault("heads", 2)
    kw.setdefault("depth", 3)
    kw.setdefault("blocks", 4)
    return PriorConfig(
        level=level, levels=2, bins=17, width=32, dropout=0.0,
        genre_classes=10,
        conditioner=ConditionerConfig(residual_depth=2) if cond else None, **kw)


@pytest.mark.parametrize("level,cond,kw", [
    (1, False, {}),                      # top prior, row/col/prev_row schedule
    pytest.param(0, True, {}, marks=pytest.mark.slow),  # upsampler with x_cond
    pytest.param(1, False, {"attn_stacks": 0}, marks=pytest.mark.slow),  # row/col schedule
    pytest.param(1, False, {"heads": 1}, marks=pytest.mark.slow),        # single head
    pytest.param(1, False, {"pos_emb": False}, marks=pytest.mark.slow),  # sinusoidal positions
    pytest.param(1, False, {"blocks": 8, "depth": 4}, marks=pytest.mark.slow),  # different grid
])
def test_decode_logits_equal_full_forward(level, cond, kw):
    vcfg = _vqvae_cfg()
    pcfg = _prior_cfg(level, cond, **kw)
    model, params = init_prior(jax.random.PRNGKey(1), vcfg, pcfg)
    spec = level_spec(vcfg, level)
    n = 3
    dec = make_decode_fn(pcfg, spec.ctx_len, n, mode=SampleMode.GREEDY,
                         return_logits=True)
    y_cond = model.apply(params, jnp.array([1, 2, 3]), method=FMHAPrior.embed_labels)
    x_cond_stream = None
    if cond:
        z_cond = jax.random.randint(jax.random.PRNGKey(3), (n, spec.cond_length), 0, 16)
        x_cond_stream = model.apply(params, z_cond, method=FMHAPrior.upsample_cond)

    tokens, dec_logits = dec(params, jax.random.PRNGKey(2), x_cond_stream, y_cond)
    assert tokens.shape == (n, spec.ctx_len + 1)
    assert int(tokens[0, 0]) == pcfg.bins - 1  # start token

    full_logits, _ = model.apply(params, tokens[:, :-1], x_cond_stream, y_cond)
    np.testing.assert_allclose(np.asarray(dec_logits), np.asarray(full_logits),
                               rtol=1e-4, atol=2e-4)
    # Greedy decode must be self-consistent with the full forward.
    np.testing.assert_array_equal(np.asarray(jnp.argmax(full_logits, -1)),
                                  np.asarray(tokens[:, 1:]))


def test_decode_without_conditioning():
    vcfg = _vqvae_cfg()
    pcfg = _prior_cfg(1, genre_classes=None) if False else _prior_cfg(1)
    model, params = init_prior(jax.random.PRNGKey(1), vcfg, pcfg)
    spec = level_spec(vcfg, 1)
    dec = make_decode_fn(pcfg, spec.ctx_len, 2, mode=SampleMode.GREEDY,
                         return_logits=True)
    tokens, dec_logits = dec(params, jax.random.PRNGKey(2), None, None)
    full_logits, _ = model.apply(params, tokens[:, :-1])
    np.testing.assert_allclose(np.asarray(dec_logits), np.asarray(full_logits),
                               rtol=1e-4, atol=2e-4)


def test_xla_path_bf16_caches_full_forward_fidelity():
    """The non-fused scan path honors float cache_dtype (r4: at the
    JUKEBOX_SMALL_PRIOR geometry f32 caches are a 48 GB HBM OOM; bf16 halves
    them).  Greedy chains can diverge from the f32-cache decode on near-ties
    (random-init tiny geometry), so the fidelity statement is the central
    invariant instead: the bf16-cache decode's logits must match the full
    f32 forward on its OWN token stream to bf16 tolerance."""
    vcfg = _vqvae_cfg()
    pcfg = _prior_cfg(1)
    model, params = init_prior(jax.random.PRNGKey(1), vcfg, pcfg)
    spec = level_spec(vcfg, 1)
    dec16 = make_decode_fn(pcfg, spec.ctx_len, 2, mode=SampleMode.GREEDY,
                           return_logits=True, fused=False,
                           cache_dtype="bfloat16")
    t16, l16 = dec16(params, jax.random.PRNGKey(2), None, None)
    full16, _ = model.apply(params, t16[:, :-1])
    np.testing.assert_allclose(np.asarray(l16), np.asarray(full16),
                               rtol=2e-2, atol=5e-2)
    # weight_dtype=bfloat16 (streamed folded weights) holds the same bound.
    decw = make_decode_fn(pcfg, spec.ctx_len, 2, mode=SampleMode.GREEDY,
                          return_logits=True, fused=False,
                          cache_dtype="bfloat16", weight_dtype="bfloat16")
    tw, lw = decw(params, jax.random.PRNGKey(2), None, None)
    fullw, _ = model.apply(params, tw[:, :-1])
    np.testing.assert_allclose(np.asarray(lw), np.asarray(fullw),
                               rtol=2e-2, atol=8e-2)
    # int8 caches stay fused-kernel-only (scales live in the kernel).
    with pytest.raises(AssertionError, match="fused-kernel-only"):
        make_decode_fn(pcfg, spec.ctx_len, 2, mode=SampleMode.GREEDY,
                       fused=False, cache_dtype="int8")


def test_gumbel_sampling_matches_categorical_distribution():
    """Gumbel-max sampling == categorical (the reference's
    RelaxedOneHotCategorical(1)+argmax, autoregressive_fmha.py:217-221)."""
    logits = jnp.log(jnp.array([[0.7, 0.2, 0.1]]))
    draws = []
    for i in range(2000):
        t = sample_token(jax.random.PRNGKey(i), logits, SampleMode.GUMBEL)
        draws.append(int(t[0]))
    freq = np.bincount(draws, minlength=3) / len(draws)
    np.testing.assert_allclose(freq, [0.7, 0.2, 0.1], atol=0.04)


def test_top_k_restricts_support():
    logits = jnp.array([[0.0, 5.0, 4.0, -2.0]])
    for i in range(50):
        t = sample_token(jax.random.PRNGKey(i), logits, SampleMode.TOP_K, top_k=2)
        assert int(t[0]) in (1, 2)


def test_ancestral_sampler_chain():
    """Sampler.py:122-136 — 2-level ancestral sampling with and without labels."""
    vcfg = _vqvae_cfg()
    scfg = SamplerConfig(vqvae=vcfg, prior_width=32, prior_depth=3, prior_heads=2,
                         prior_blocks=4, genre_classes=10,
                         conditioner=ConditionerConfig(residual_depth=2))
    sampler = AncestralSampler.from_config(scfg, jax.random.PRNGKey(0))
    zs = sampler.sample_codes(3, jax.random.PRNGKey(1), y_genre=jnp.array([0, 1, 2]))
    assert [z.shape for z in zs] == [(3, 128), (3, 32)]
    assert all(int(z.min()) >= 0 and int(z.max()) <= 16 for z in zs)
    wav = sampler.sample_audio(3, jax.random.PRNGKey(2), y_genre=jnp.array([0, 1, 2]))
    assert wav.shape == (3, vcfg.sample_length, 1)
    wav2 = sampler.sample_audio(2, jax.random.PRNGKey(3))  # no labels
    assert wav2.shape == (2, vcfg.sample_length, 1)


def test_sample_audio_staged_equals_async():
    """The peak-HBM-bounded staged chain must produce the SAME audio as the
    all-async `sample_audio` for the same rng — it is the same ancestral
    chain with syncs and frees between stages (r5 wide-soak OOM fix)."""
    vcfg = _vqvae_cfg()
    scfg = SamplerConfig(vqvae=vcfg, prior_width=32, prior_depth=3,
                         prior_heads=2, prior_blocks=4, genre_classes=10,
                         conditioner=ConditionerConfig(residual_depth=2))
    sampler = AncestralSampler.from_config(scfg, jax.random.PRNGKey(0))
    y = jnp.array([0, 1])
    wav_async = np.asarray(
        sampler.sample_audio(2, jax.random.PRNGKey(9), y_genre=y))
    wav_staged = np.asarray(
        sampler.sample_audio_staged(2, jax.random.PRNGKey(9), y_genre=y))
    np.testing.assert_array_equal(wav_async, wav_staged)
    # unconditional variant too
    np.testing.assert_array_equal(
        np.asarray(sampler.sample_audio(2, jax.random.PRNGKey(10))),
        np.asarray(sampler.sample_audio_staged(2, jax.random.PRNGKey(10))))


@pytest.mark.slow
def test_compile_chain_matches_stepwise_sampler():
    """The single-jit serving chain must equal the stepwise sample_audio."""
    vcfg = _vqvae_cfg()
    scfg = SamplerConfig(vqvae=vcfg, prior_width=32, prior_depth=3,
                         prior_heads=2, prior_blocks=4, genre_classes=10,
                         conditioner=ConditionerConfig(residual_depth=2))
    sampler = AncestralSampler.from_config(scfg, jax.random.PRNGKey(0))
    y = jnp.array([0, 1])
    chain = sampler.compile_chain(2)
    wav_chain = chain(jax.random.PRNGKey(5), y)
    wav_step = sampler.sample_audio(2, jax.random.PRNGKey(5), y_genre=y)
    np.testing.assert_allclose(np.asarray(wav_chain), np.asarray(wav_step),
                               rtol=1e-5, atol=1e-5)
    # unconditional variant
    chain_u = sampler.compile_chain(2, with_labels=False)
    wav_u = chain_u(jax.random.PRNGKey(6))
    assert wav_u.shape == (2, vcfg.sample_length, 1)


@pytest.mark.slow
def test_sampler_determinism_per_seed():
    vcfg = _vqvae_cfg()
    scfg = SamplerConfig(vqvae=vcfg, prior_width=32, prior_depth=3, prior_heads=2,
                         prior_blocks=4, conditioner=ConditionerConfig(residual_depth=2))
    sampler = AncestralSampler.from_config(scfg, jax.random.PRNGKey(0))
    z1 = sampler.sample_codes(2, jax.random.PRNGKey(7))
    z2 = sampler.sample_codes(2, jax.random.PRNGKey(7))
    for a, b in zip(z1, z2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_primed_continuation_decoding():
    """prime tokens are teacher-forced; the continuation is consistent with a
    greedy full-forward given the primed prefix."""
    vcfg = _vqvae_cfg()
    pcfg = _prior_cfg(1)
    from vae_music_tpu.train.prior_step import init_prior

    model, params = init_prior(jax.random.PRNGKey(1), vcfg, pcfg)
    ctx = vcfg.z_lengths[1]
    n, p_len = 2, 10
    prime = jax.random.randint(jax.random.PRNGKey(4), (n, p_len), 0, 16)
    dec = make_decode_fn(pcfg, ctx, n, mode=SampleMode.GREEDY,
                         return_logits=True, prime_len=p_len)
    tokens, logits = dec(params, jax.random.PRNGKey(2), None, None, prime)
    # positions 1..P echo the prime
    np.testing.assert_array_equal(np.asarray(tokens[:, 1 : p_len + 1]),
                                  np.asarray(prime))
    # and the whole sequence (prime + continuation) is full-forward-consistent
    full_logits, _ = model.apply(params, tokens[:, :-1])
    np.testing.assert_allclose(np.asarray(logits), np.asarray(full_logits),
                               rtol=1e-4, atol=2e-4)
    np.testing.assert_array_equal(
        np.asarray(jnp.argmax(full_logits[:, p_len:], -1)),
        np.asarray(tokens[:, p_len + 1 :]))


@pytest.mark.slow
def test_sample_long_windowed_generation():
    """Arbitrary-length generation via overlapping primed windows: per-level
    code grids of total_ctx_mult x ctx, decoded to long audio."""
    vcfg = _vqvae_cfg()
    scfg = SamplerConfig(vqvae=vcfg, prior_width=32, prior_depth=2,
                         prior_heads=2, prior_blocks=4, genre_classes=10,
                         conditioner=ConditionerConfig(residual_depth=1))
    sampler = AncestralSampler.from_config(scfg, jax.random.PRNGKey(0))
    zs = sampler.sample_codes_long(2, jax.random.PRNGKey(1), total_ctx_mult=3,
                                   overlap_frac=0.5, y_genre=jnp.array([0, 1]))
    assert [z.shape for z in zs] == [(2, 3 * 128), (2, 3 * 32)]
    assert all(np.isfinite(np.asarray(z)).all() for z in zs)
    wav = sampler.sample_audio_long(2, jax.random.PRNGKey(2), total_ctx_mult=2)
    assert wav.shape == (2, 2 * vcfg.sample_length, 1)
    assert np.isfinite(np.asarray(wav)).all()


@pytest.mark.parametrize("overlap", [0.0, 0.75])
@pytest.mark.slow
def test_sample_long_overlap_extremes(overlap):
    """overlap_frac=0 means abutting unprimed windows; large overlaps re-prime
    with most of the context. Both must produce exact-length finite codes."""
    vcfg = _vqvae_cfg()
    scfg = SamplerConfig(vqvae=vcfg, prior_width=32, prior_depth=2,
                         prior_heads=2, prior_blocks=4, genre_classes=10,
                         conditioner=ConditionerConfig(residual_depth=1))
    sampler = AncestralSampler.from_config(scfg, jax.random.PRNGKey(0))
    zs = sampler.sample_codes_long(1, jax.random.PRNGKey(1), total_ctx_mult=2,
                                   overlap_frac=overlap)
    assert [z.shape for z in zs] == [(1, 2 * 128), (1, 2 * 32)]
    assert all(np.isfinite(np.asarray(z)).all() for z in zs)


def test_top_p_sample_token():
    """Nucleus sampling: tokens only from the smallest prefix of
    descending-prob tokens whose mass reaches top_p; top_p=1 == categorical."""
    import numpy as np

    from vae_music_tpu.sample.decode import SampleMode, sample_token

    # probs ~ [0.57, 0.21, 0.12, 0.08, 0.02, ...tiny]: top_p=0.7 keeps {0, 1}.
    base = jnp.log(jnp.asarray([28.0, 10.5, 6.0, 4.0, 1.0, 0.2, 0.1, 0.05]))
    logits = jnp.tile(base[None], (256, 1))
    toks = np.asarray(sample_token(jax.random.PRNGKey(0), logits,
                                   SampleMode.TOP_P, top_p=0.7))
    assert set(toks.tolist()) <= {0, 1}
    assert len(set(toks.tolist())) == 2            # actually sampling, not greedy

    # top_p=1.0 must match plain categorical exactly (same rng stream).
    a = sample_token(jax.random.PRNGKey(1), logits, SampleMode.TOP_P, top_p=1.0)
    b = sample_token(jax.random.PRNGKey(1), logits, SampleMode.GUMBEL)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # threshold token itself stays includable: top_p just above P(top)
    toks2 = np.asarray(sample_token(jax.random.PRNGKey(2), logits,
                                    SampleMode.TOP_P, top_p=0.58))
    assert set(toks2.tolist()) <= {0, 1}


def test_top_p_decode_end_to_end():
    """TOP_P mode through make_decode_fn: valid tokens, varies across seeds;
    the in-kernel gate still rejects what the kernel can't do (logits
    capture).  (r3: TOP_P itself is now in-kernel — tests/test_decode_topp.py
    covers that path.)"""
    vcfg = _vqvae_cfg()
    pcfg = _prior_cfg(1)
    _, params = init_prior(jax.random.PRNGKey(1), vcfg, pcfg)
    ctx = vcfg.z_lengths[1]
    dec = make_decode_fn(pcfg, ctx, 2, mode=SampleMode.TOP_P, top_p=0.9)
    a = np.asarray(dec(params, jax.random.PRNGKey(2), None, None))
    b = np.asarray(dec(params, jax.random.PRNGKey(3), None, None))
    assert a.shape == (2, ctx + 1)
    assert (a[:, 1:] >= 0).all() and (a[:, 1:] < pcfg.bins).all()
    assert (a != b).any()                      # sampling, not greedy

    import pytest as _pytest

    with _pytest.raises(AssertionError):
        make_decode_fn(pcfg, ctx, 2, mode=SampleMode.TOP_P, top_p=0.9,
                       fused=True, fused_interpret=True, sample_in_kernel=True,
                       return_logits=True)


@pytest.mark.slow
def test_compile_chain_batch_chunking():
    """Batches above the serving sweet spot run as a lax.map over chunks
    inside one jit (r3: single-scan batch 512 measured SLOWER per clip than
    256): each chunk equals a standalone chain run with the corresponding
    split RNG, chunks draw independent streams, and labels land in the right
    chunk."""
    vcfg = _vqvae_cfg()
    scfg = SamplerConfig(vqvae=vcfg, prior_width=32, prior_depth=3,
                         prior_heads=2, prior_blocks=4, genre_classes=10,
                         conditioner=ConditionerConfig(residual_depth=2))
    sampler = AncestralSampler.from_config(scfg, jax.random.PRNGKey(0))
    y = jnp.array([0, 1, 2, 3])
    rng = jax.random.PRNGKey(7)

    chunked = sampler.compile_chain(4, batch_chunk=2)
    wav = np.asarray(chunked(rng, y))
    assert wav.shape == (4, vcfg.sample_length, 1)

    # each chunk must equal the standalone chain at that chunk's RNG/labels
    single = sampler.compile_chain(2, batch_chunk=0)
    rngs = jax.random.split(rng, 2)
    np.testing.assert_allclose(wav[:2], np.asarray(single(rngs[0], y[:2])),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(wav[2:], np.asarray(single(rngs[1], y[2:])),
                               rtol=1e-5, atol=1e-5)
    assert not np.allclose(wav[:2], wav[2:])   # independent streams

    # unconditional chunked variant
    chain_u = sampler.compile_chain(4, with_labels=False, batch_chunk=2)
    assert chain_u(rng).shape == (4, vcfg.sample_length, 1)


def test_compile_chain_pad_to_fused():
    """Small batches pad up to the fused kernel's lane minimum and slice
    (r3: padded fused batch-64 measured 22.8 ms vs 52.6 ms for the XLA
    batch-1 chain).  On CPU the kernel is unavailable so the pad is a
    no-op; the pad/slice plumbing is exercised by forcing the pad size."""
    vcfg = _vqvae_cfg()
    scfg = SamplerConfig(vqvae=vcfg, prior_width=32, prior_depth=3,
                         prior_heads=2, prior_blocks=4, genre_classes=10,
                         conditioner=ConditionerConfig(residual_depth=2))
    sampler = AncestralSampler.from_config(scfg, jax.random.PRNGKey(0))

    # Backend gate: unavailable kernel (CPU) means no padding.
    assert sampler._fused_pad_batch(3) == 3

    # The pad arithmetic, with availability forced: heads=2 at every level
    # -> lane step 64.
    from vae_music_tpu.ops import decode_pallas as dp
    orig = dp.decode_pallas_available
    dp.decode_pallas_available = lambda *a, **k: True
    try:
        assert sampler._fused_pad_batch(1) == 64
        assert sampler._fused_pad_batch(64) == 64
        assert sampler._fused_pad_batch(65) == 128
    finally:
        dp.decode_pallas_available = orig

    # Pad/slice plumbing: force pad 2 -> 4; the sliced chain must equal the
    # first 2 rows of the padded chain (same RNG, labels padded with 0).
    rng = jax.random.PRNGKey(5)
    y = jnp.array([3, 7])
    orig_pad = sampler._fused_pad_batch
    sampler._fused_pad_batch = lambda n: 4
    try:
        chain2 = sampler.compile_chain(2, batch_chunk=0)
    finally:
        sampler._fused_pad_batch = orig_pad
    wav2 = np.asarray(chain2(rng, y))
    assert wav2.shape == (2, vcfg.sample_length, 1)
    chain4 = sampler.compile_chain(4, batch_chunk=0)
    wav4 = np.asarray(chain4(rng, jnp.array([3, 7, 0, 0])))
    np.testing.assert_allclose(wav2, wav4[:2], rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_compile_chain_batch_chunking_remainder():
    """n_samples that is NOT a multiple of batch_chunk runs floor(n/chunk)
    chunks plus one remainder-sized chain (r3 review fix: previously a
    non-multiple silently fell through to the single oversized scan).  The
    remainder chunk uses the (n_chunks+1)-th split key and the trailing
    labels."""
    vcfg = _vqvae_cfg()
    scfg = SamplerConfig(vqvae=vcfg, prior_width=32, prior_depth=3,
                         prior_heads=2, prior_blocks=4, genre_classes=10,
                         conditioner=ConditionerConfig(residual_depth=2))
    sampler = AncestralSampler.from_config(scfg, jax.random.PRNGKey(0))
    y = jnp.array([0, 1, 2, 3, 4])
    rng = jax.random.PRNGKey(11)

    chunked = sampler.compile_chain(5, batch_chunk=2)
    wav = np.asarray(chunked(rng, y))
    assert wav.shape == (5, vcfg.sample_length, 1)

    # full chunks match the standalone 2-chain; the remainder clip matches a
    # standalone 1-chain at the extra split key with the trailing label
    single2 = sampler.compile_chain(2, batch_chunk=0)
    single1 = sampler.compile_chain(1, batch_chunk=0)
    rngs = jax.random.split(rng, 3)
    np.testing.assert_allclose(wav[:2], np.asarray(single2(rngs[0], y[:2])),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(wav[2:4], np.asarray(single2(rngs[1], y[2:4])),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(wav[4:], np.asarray(single1(rngs[2], y[4:])),
                               rtol=1e-5, atol=1e-5)
