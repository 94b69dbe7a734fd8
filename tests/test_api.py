"""Facade-API tests: the reference's public surface end to end
(vqvae.py / prior.py / Sampler.py method shapes)."""

import jax
import jax.numpy as jnp
import numpy as np

from vae_music_tpu.api import Prior, VQVAE, VQVAESampler
from vae_music_tpu.configs import ConditionerConfig, PriorConfig, VQVAEConfig
from vae_music_tpu.data.audio import synthetic_audio_batch
import pytest


def _cfg():
    return VQVAEConfig(
        sample_length=1024, levels=2, latent_dim=8, codebook_size=16,
        down_depth=(3, 2), strides=(2, 2), residual_width=8, residual_depth=1,
        dilation_factor=3, use_spectral_loss=False,
    ).validate()


def _prior_cfg(level, cond):
    return PriorConfig(
        level=level, levels=2, bins=17, width=32, depth=2, heads=2, blocks=4,
        attn_stacks=1, dropout=0.0, genre_classes=10,
        conditioner=ConditionerConfig(residual_depth=1) if cond else None)


@pytest.mark.slow
def test_full_reference_workflow():
    """The reference's end-to-end usage: train VQVAE -> train priors ->
    ancestral sample -> decode audio, through the facade objects."""
    x, y = synthetic_audio_batch(0, 8, 1024)

    vqvae = VQVAE(_cfg())
    m = vqvae.train_step(x[:4])
    assert "loss" in m
    m2 = vqvae.test_step(x[:4])
    assert np.isfinite(m2["loss"])

    recons, metrics = vqvae(x[:2])
    assert len(recons) == 2 and recons[0].shape == (2, 1024, 1)

    zs = vqvae.encode(x[:2])
    assert [z.shape for z in zs] == [(2, 128), (2, 32)]
    wav = vqvae.decode(zs[0], level=0)
    assert wav.shape == (2, 1024, 1)

    top = Prior(1, vqvae, prior_cfg=_prior_cfg(1, False))
    up = Prior(0, vqvae, prior_cfg=_prior_cfg(0, True))
    tm = top.train_step(x[:4], y[:4])
    assert {"loss", "perplexity", "accuracy"} <= set(tm)
    um = up.train_step(x[:4], y[:4])
    assert np.isfinite(um["loss"])

    logits, target, loss, acc = top(x[:2], y[:2])
    assert logits.shape == (2, 32, 17) and target.shape == (2, 32)

    # get_cond window math (prior.py:186-195)
    z_fake = [None, jnp.zeros((2, 32), jnp.int32)]
    cond = up.get_cond(z_fake, 0, 128)
    assert cond.shape == (2, 32)
    assert top.get_cond(z_fake, 0, 32) is None

    # single-level sampling with labels
    tokens = top.sample(2, y=y[:2], rng=jax.random.PRNGKey(0))
    assert tokens.shape == (2, 33)
    assert int(tokens[0, 0]) == 16  # start token

    # full ancestral chain
    sampler = VQVAESampler(vqvae, [up, top])
    zs = sampler.sample(2, y_genre=y[:2], rng=jax.random.PRNGKey(1))
    assert [z.shape for z in zs] == [(2, 128), (2, 32)]
    audio = sampler.sample_audio(2, y_genre=y[:2], rng=jax.random.PRNGKey(2))
    assert audio.shape == (2, 1024, 1)

    # arbitrary-length generation through the facade
    long_audio = sampler.sample_audio_long(2, total_ctx_mult=2,
                                           y_genre=y[:2],
                                           rng=jax.random.PRNGKey(3))
    assert long_audio.shape == (2, 2048, 1)


@pytest.mark.slow
def test_facade_serving_entry_points():
    """compile_chain / export through the facade == each other exactly."""
    x, y = synthetic_audio_batch(0, 4, 1024)
    vqvae = VQVAE(_cfg())
    vqvae.train_step(x[:4])
    top = Prior(1, vqvae, prior_cfg=_prior_cfg(1, False))
    up = Prior(0, vqvae, prior_cfg=_prior_cfg(0, True))
    sampler = VQVAESampler(vqvae, [up, top])

    chain = sampler.compile_chain(2)
    wav = np.asarray(chain(jax.random.PRNGKey(4), y[:2]))
    assert wav.shape == (2, 1024, 1)
    import tempfile

    from vae_music_tpu.sample.export import load_chain

    with tempfile.TemporaryDirectory() as d:
        p = f"{d}/chain.jaxexp"
        assert sampler.export(2, p) > 10_000
        exported = np.asarray(load_chain(p)(
            jnp.asarray(jax.random.PRNGKey(4), jnp.uint32), y[:2]))
    np.testing.assert_allclose(exported, wav, atol=1e-6)


def test_api_smoke_fast():
    """Fast-tier facade coverage: VQVAE train/encode/decode + Prior
    train_step/call shapes on a single level (the full workflow incl.
    sampling is the slow-marked test above)."""
    cfg = VQVAEConfig(
        sample_length=256, levels=1, latent_dim=8, codebook_size=16,
        down_depth=(3,), strides=(2,), residual_width=8, residual_depth=1,
        dilation_factor=3, use_spectral_loss=False,
    ).validate()
    vq = VQVAE(cfg, seed=0)
    x, y = synthetic_audio_batch(0, 4, cfg.sample_length)
    m = vq.train_step(jnp.asarray(x))
    assert np.isfinite(m["loss"])
    zs = vq.encode(jnp.asarray(x))
    assert zs[0].shape == (4, cfg.z_lengths[0])
    wav = vq.decode(zs[0], level=0)
    assert wav.shape == (4, cfg.sample_length, 1)

    prior = Prior(0, vq, prior_cfg=PriorConfig(
        level=0, levels=1, bins=17, width=32, depth=2, heads=2, blocks=4,
        attn_stacks=1, dropout=0.0, genre_classes=10))
    pm = prior.train_step(jnp.asarray(x), jnp.asarray(y))
    assert np.isfinite(pm["loss"])
    logits, target, loss, acc = prior(jnp.asarray(x), jnp.asarray(y))
    assert logits.shape == (4, cfg.z_lengths[0], 17)
    assert target.shape == (4, cfg.z_lengths[0])
