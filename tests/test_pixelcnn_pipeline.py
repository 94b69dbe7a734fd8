"""End-to-end PixelCNN-prior pipeline over VQ code grids: encode audio ->
train PixelCNN on codes -> ancestral-sample a grid -> VQ-decode to audio
(the BASELINE.json SMALL_PRIOR 'PixelCNN over token grids' configuration)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vae_music_tpu.configs import VQVAEConfig
from vae_music_tpu.data.audio import synthetic_audio_batch
from vae_music_tpu.models.pixelcnn import PixelCNN, make_pixelcnn_sampler, pixelcnn_loss
from vae_music_tpu.models.vqvae import init_vqvae, vqvae_decode, vqvae_encode
import pytest


@pytest.mark.slow
def test_pixelcnn_prior_over_vq_codes():
    cfg = VQVAEConfig(
        sample_length=512, levels=1, latent_dim=8, codebook_size=16,
        down_depth=(3,), strides=(2,), residual_width=8, residual_depth=1,
        dilation_factor=3, use_spectral_loss=False,
    ).validate()
    vp, cbs = init_vqvae(jax.random.PRNGKey(0), cfg)
    x, y = synthetic_audio_batch(0, 8, cfg.sample_length)
    codes = vqvae_encode(vp, cbs, cfg, jnp.asarray(x))[0]  # (8, 64)
    assert codes.shape == (8, 64)

    prior = PixelCNN(bins=16, filters=16, residual_blocks=1, kernel=(1, 7),
                     num_classes=10)
    params = prior.init(jax.random.PRNGKey(1), codes, jnp.asarray(y))
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        loss, g = jax.value_and_grad(
            lambda p: pixelcnn_loss(prior, p, codes, jnp.asarray(y)))(params)
        upd, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, upd), opt, loss

    first = None
    for _ in range(20):
        params, opt, loss = step(params, opt)
        first = first or float(loss)
    assert float(loss) < first

    sampler = make_pixelcnn_sampler(prior, (64,), 2)
    grid = sampler(params, jax.random.PRNGKey(2), jnp.asarray(y[:2]))
    assert grid.shape == (2, 64)
    wav = vqvae_decode(vp, cbs, cfg, grid, 0)
    assert wav.shape == (2, cfg.sample_length, 1)
    assert np.isfinite(np.asarray(wav)).all()
