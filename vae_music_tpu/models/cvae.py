"""Convolutional VAEs over raw/mu-law waveforms.

Covers the second notebook lineage
(/root/reference/notebooks/MusicGeneration_WavePlot.ipynb cells 42-44, 62-66):
  * ``CVAE``       — Gaussian reparameterized conv VAE over float waveforms;
                     loss = MSE reconstruction + KL(q(z|x) || N(0, I))
  * ``CVAEMulaw``  — same encoder; the decoder emits a 256-way categorical
                     per sample over mu-law codes, trained with sparse CE
                     (QUANTIZATION_CHANNELS=256, cells 7/19).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vae_music_tpu.data.audio import QUANTIZATION_CHANNELS, mu_law_encode


class ConvEncoder(nn.Module):
    latent_dim: int
    widths: Sequence[int] = (32, 64)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        for wdt in self.widths:
            x = nn.Conv(wdt, (4,), strides=(2,), padding="SAME", dtype=self.dtype)(x)
            x = nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        mean = nn.Dense(self.latent_dim, dtype=self.dtype, name="z_mean")(x)
        logvar = nn.Dense(self.latent_dim, dtype=self.dtype, name="z_log_var")(x)
        return mean, logvar


class ConvDecoder(nn.Module):
    out_length: int
    out_channels: int
    widths: Sequence[int] = (64, 32)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        up = 2 ** len(self.widths)
        assert self.out_length % up == 0
        t0 = self.out_length // up
        x = nn.Dense(t0 * self.widths[0], dtype=self.dtype)(z)
        x = nn.relu(x).reshape(z.shape[0], t0, self.widths[0])
        for wdt in self.widths:
            x = nn.ConvTranspose(wdt, (4,), strides=(2,), padding="SAME",
                                 dtype=self.dtype)(x)
            x = nn.relu(x)
        return nn.Conv(self.out_channels, (3,), padding="SAME", dtype=self.dtype)(x)


class CVAE(nn.Module):
    """Gaussian conv VAE (notebook cell 42)."""

    sample_length: int
    latent_dim: int = 64
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = ConvEncoder(self.latent_dim, dtype=self.dtype)
        self.decoder = ConvDecoder(self.sample_length, 1, dtype=self.dtype)

    def __call__(self, x: jnp.ndarray, rng: jax.Array):
        mean, logvar = self.encoder(x)
        eps = jax.random.normal(rng, mean.shape, mean.dtype)
        z = mean + jnp.exp(0.5 * logvar) * eps      # reparameterization
        recon = self.decoder(z)
        return recon, mean, logvar

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        return self.decoder(z)


class CVAEMulaw(nn.Module):
    """Mu-law categorical-output conv VAE (notebook cell 44)."""

    sample_length: int
    latent_dim: int = 64
    channels: int = QUANTIZATION_CHANNELS
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = ConvEncoder(self.latent_dim, dtype=self.dtype)
        self.decoder = ConvDecoder(self.sample_length, self.channels,
                                   dtype=self.dtype)

    def __call__(self, x: jnp.ndarray, rng: jax.Array):
        mean, logvar = self.encoder(x)
        eps = jax.random.normal(rng, mean.shape, mean.dtype)
        z = mean + jnp.exp(0.5 * logvar) * eps
        logits = self.decoder(z)                    # (N, T, 256)
        return logits, mean, logvar

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        return self.decoder(z)


def kl_divergence(mean: jnp.ndarray, logvar: jnp.ndarray) -> jnp.ndarray:
    """Mean KL(q || N(0,I)) per example."""
    return jnp.mean(-0.5 * jnp.sum(1 + logvar - jnp.square(mean)
                                   - jnp.exp(logvar), axis=-1))


def cvae_loss(model: CVAE, params, x, rng, kl_weight: float = 1.0):
    recon, mean, logvar = model.apply(params, x, rng)
    recon_loss = jnp.mean(jnp.square(x - recon))
    kl = kl_divergence(mean, logvar)
    return recon_loss + kl_weight * kl, {"recon_loss": recon_loss, "kl": kl}


def cvae_mulaw_loss(model: CVAEMulaw, params, x, rng, kl_weight: float = 1.0):
    """Sparse-CE over mu-law codes of the input waveform (notebook cell 44)."""
    logits, mean, logvar = model.apply(params, x, rng)
    codes = mu_law_encode(jnp.squeeze(x, -1), model.channels)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, codes[..., None], axis=-1)[..., 0]
    recon_loss = jnp.mean(nll)
    kl = kl_divergence(mean, logvar)
    return recon_loss + kl_weight * kl, {"recon_loss": recon_loss, "kl": kl}
