"""Audio codecs and synthetic data.

The mu-law codec mirrors the ITU-T implementation in
/root/reference/notebooks/MusicGeneration_WavePlot.ipynb (cell 19,
QUANTIZATION_CHANNELS=256); synthetic audio provides a dataset fallback for
development/benchmarking when GTZAN is not on disk.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 3000          # data_utils.py:11
QUANTIZATION_CHANNELS = 256


def mu_law_encode(audio: jnp.ndarray, quantization_channels: int = QUANTIZATION_CHANNELS) -> jnp.ndarray:
    """Float waveform in [-1, 1] -> int codes in [0, channels)."""
    mu = jnp.float32(quantization_channels - 1)
    audio = jnp.clip(audio, -1.0, 1.0)
    magnitude = jnp.log1p(mu * jnp.abs(audio)) / jnp.log1p(mu)
    signal = jnp.sign(audio) * magnitude
    return jnp.asarray((signal + 1.0) / 2.0 * mu + 0.5, dtype=jnp.int32)


def mu_law_decode(codes: jnp.ndarray, quantization_channels: int = QUANTIZATION_CHANNELS) -> jnp.ndarray:
    """Int codes -> float waveform in [-1, 1]."""
    mu = jnp.float32(quantization_channels - 1)
    signal = 2.0 * (codes.astype(jnp.float32) / mu) - 1.0
    magnitude = (1.0 / mu) * (jnp.power(1.0 + mu, jnp.abs(signal)) - 1.0)
    return jnp.sign(signal) * magnitude


def synthetic_corpus_device(seed: int, batch: int, length: int,
                            num_genres: int = 10):
    """On-device twin of :func:`synthetic_audio_batch` for large corpora.

    Host->device transfers over the tunneled TPU backend are slow, so soak
    training (scripts/soak.py) generates its corpus directly on the device:
    the same genre-dependent harmonic-stack recipe, vectorized over the batch
    under one jit.  Returns (waves (N, T, 1) float32 in [-1, 1], labels (N,)
    int32) as device arrays.  Not bit-identical to the numpy version (jax
    PRNG), statistically the same family.
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def build(key):
        kl, kp, ka, kv, ke, kn = jax.random.split(key, 6)
        t = jnp.arange(length, dtype=jnp.float32) / SAMPLE_RATE
        labels = jax.random.randint(kl, (batch,), 0, num_genres)
        base = 55.0 * (2.0 ** (labels % 6)).astype(jnp.float32)  # (N,)
        phases = jax.random.uniform(kp, (batch, 4), minval=0.0,
                                    maxval=2 * jnp.pi)
        amps = jax.random.uniform(ka, (batch, 4), minval=0.2, maxval=1.0)
        vib_f = jax.random.uniform(kv, (batch, 4), minval=0.5, maxval=4.0)
        env_f = jax.random.uniform(ke, (batch,), minval=0.2, maxval=2.0)
        wave = jnp.zeros((batch, length), jnp.float32)
        for h in range(1, 5):  # harmonic stack, one (N, T) term at a time
            vib = 1.0 + 0.01 * jnp.sin(
                2 * jnp.pi * vib_f[:, h - 1 : h] * t[None, :])
            wave = wave + (amps[:, h - 1 : h] / h) * jnp.sin(
                2 * jnp.pi * base[:, None] * h * vib * t[None, :]
                + phases[:, h - 1 : h])
        env = 0.5 * (1.0 + jnp.sin(2 * jnp.pi * env_f[:, None] * t[None, :]))
        wave = wave * env + 0.02 * jax.random.normal(kn, (batch, length))
        wave = wave / (jnp.abs(wave).max(axis=1, keepdims=True) + 1e-6)
        return wave[..., None], labels.astype(jnp.int32)

    return build(jax.random.PRNGKey(seed))


def synthetic_audio_batch(
    rng: np.random.Generator | int,
    batch: int,
    length: int,
    num_genres: int = 10,
) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic pseudo-music: genre-dependent harmonic stacks + noise.

    Returns (waveforms (N, T, 1) float32 in [-1,1], labels (N,) int32).
    Structured (not white noise) so VQ-VAE reconstruction losses are meaningful.
    """
    if isinstance(rng, int):
        rng = np.random.default_rng(rng)
    t = np.arange(length, dtype=np.float32) / SAMPLE_RATE
    labels = rng.integers(0, num_genres, size=(batch,))
    waves = np.zeros((batch, length), dtype=np.float32)
    for i, g in enumerate(labels):
        base = 55.0 * (2.0 ** (g % 6))  # genre-dependent fundamental
        wave = np.zeros_like(t)
        for h in range(1, 5):
            phase = rng.uniform(0, 2 * np.pi)
            amp = rng.uniform(0.2, 1.0) / h
            vib = 1.0 + 0.01 * np.sin(2 * np.pi * rng.uniform(0.5, 4.0) * t)
            wave += amp * np.sin(2 * np.pi * base * h * vib * t + phase)
        env = 0.5 * (1.0 + np.sin(2 * np.pi * rng.uniform(0.2, 2.0) * t))
        wave = wave * env + 0.02 * rng.standard_normal(length).astype(np.float32)
        waves[i] = wave / (np.abs(wave).max() + 1e-6)
    return waves[..., None].astype(np.float32), labels.astype(np.int32)
