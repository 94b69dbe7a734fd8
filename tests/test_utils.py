"""Inspection/profiling utility tests (tf_utils.py #17 equivalents)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from vae_music_tpu.configs import VQVAEConfig
from vae_music_tpu.data.audio import synthetic_audio_batch
from vae_music_tpu.models.vqvae import init_vqvae
from vae_music_tpu.utils.inspect import (
    generate_and_save_waves,
    plot_attention_weights,
    plot_codebook_usage,
    plot_waveforms,
)
from vae_music_tpu.utils.profiling import timed
from vae_music_tpu.utils.shapes import assert_shape, prod


def _tiny_cfg():
    return VQVAEConfig(
        sample_length=1024, levels=1, latent_dim=8, codebook_size=16,
        down_depth=(3,), strides=(2,), residual_width=8, residual_depth=2,
        dilation_factor=3, use_spectral_loss=False,
    ).validate()


def test_shape_utils():
    assert prod([2, 3, 4]) == 24
    x = jnp.zeros((2, 3))
    assert_shape(x, (2, None))
    try:
        assert_shape(x, (3, 3))
        assert False
    except ValueError:
        pass


def test_plots_write_files(tmp_path):
    ok = plot_attention_weights(np.random.rand(2, 8, 8), str(tmp_path / "a.png"))
    assert not ok or os.path.exists(tmp_path / "a.png")
    ok = plot_codebook_usage(np.random.rand(16), str(tmp_path / "u.png"))
    assert not ok or os.path.exists(tmp_path / "u.png")
    ok = plot_waveforms(np.random.rand(3, 100), str(tmp_path / "w.png"))
    assert not ok or os.path.exists(tmp_path / "w.png")


def test_generate_and_save_waves_modes(tmp_path):
    cfg = _tiny_cfg()
    params, cbs = init_vqvae(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(synthetic_audio_batch(0, 2, cfg.sample_length)[0])

    # reconstruction + decode-given-codes + codebook report
    codes = jnp.zeros((2, cfg.z_lengths[0]), jnp.int32)
    arts = generate_and_save_waves(
        params, cbs, cfg, x, str(tmp_path), epoch=1, level=0,
        if_decode=True, latent_code=codes,
        print_codebook_distribution=True)
    assert arts["reconstructions"].shape == (2, cfg.sample_length, 1)
    assert arts["decoded"].shape == (2, cfg.sample_length, 1)
    assert "codebook_report" in arts
    assert os.path.exists(tmp_path / "recon_e1_0.wav")
    assert os.path.exists(tmp_path / "decoded_e1_0.wav")

    # sample_mode 1: single-level prior sampling via injected decode fn
    def fake_prior_decode(rng):
        return jax.random.randint(rng, (2, cfg.z_lengths[0] + 1), 0, 16)

    arts = generate_and_save_waves(
        params, cbs, cfg, x, str(tmp_path), epoch=2, level=0,
        if_sample=True, sample_mode=1, prior_decode_fn=fake_prior_decode,
        rng=jax.random.PRNGKey(1))
    assert arts["sampled"].shape == (2, cfg.sample_length, 1)
    assert os.path.exists(tmp_path / "sampled_e2_0.wav")


def test_timed_forces_completion():
    f = jax.jit(lambda x: jnp.sum(x * 2))
    dt, out = timed(f, jnp.ones((128, 128)), iters=3)
    assert dt > 0
    assert float(out) == 2 * 128 * 128
