"""Multiscale STFT spectral loss, TPU-native.

Semantics mirror /root/reference/data_utils.py:19-40 and
/root/reference/vqvae.py:309-326:

  * three STFT configurations (n_fft, hop, window) = STFT_ARGS
  * ``spectral`` = |STFT(x)| with a periodic Hann window of length
    ``window_length``, frame step ``hop`` and zero-padding to ``n_fft``
    (matching ``tf.signal.stft`` defaults: no end-padding, periodic Hann)
  * per-scale loss = ||S_x - S_x_hat||_F / ||S_x||_F, averaged over scales

Implementation: framing is a gather-free ``reshape+slice`` window extraction
followed by a real FFT.  Everything is static-shaped and jit-friendly; XLA
fuses the windowing multiply into the FFT's input processing.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

# (n_fft, hop_length, window_length) triples — data_utils.py:19-22.
STFT_ARGS = [
    (2048, 240, 1200),
    (1024, 120, 600),
    (512, 50, 240),
]


@functools.lru_cache(maxsize=None)
def _hann(window_length: int) -> np.ndarray:
    # Periodic Hann, matching tf.signal.hann_window(periodic=True).
    n = np.arange(window_length)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / window_length)).astype(np.float32)


def frame(x: jnp.ndarray, frame_length: int, frame_step: int) -> jnp.ndarray:
    """(..., T) -> (..., num_frames, frame_length), no end padding."""
    t = x.shape[-1]
    num_frames = 1 + (t - frame_length) // frame_step
    # Static strided window extraction: indices are a compile-time constant.
    idx = np.arange(num_frames)[:, None] * frame_step + np.arange(frame_length)[None, :]
    return x[..., idx]


def spectral(x: jnp.ndarray, n_fft: int, hop_length: int, window_length: int) -> jnp.ndarray:
    """Magnitude STFT: (..., T) -> (..., num_frames, n_fft // 2 + 1)."""
    x = x.astype(jnp.float32)
    frames = frame(x, window_length, hop_length)
    frames = frames * _hann(window_length)
    return jnp.abs(jnp.fft.rfft(frames, n=n_fft, axis=-1))


def frobenius_norm(x: jnp.ndarray) -> jnp.ndarray:
    """Frobenius norm over the trailing two axes (data_utils.py:33-40)."""
    return jnp.sqrt(jnp.sum(jnp.square(x), axis=(-2, -1)))


def multiscale_spectral_loss(target: jnp.ndarray, recon: jnp.ndarray) -> jnp.ndarray:
    """Per-example bandwidth-relative multiscale spectral loss (vqvae.py:309-326).

    target/recon: (N, T) or (N, T, 1).  Returns (N,).
    """
    if target.ndim == 3:
        target = jnp.squeeze(target, axis=-1)
    if recon.ndim == 3:
        recon = jnp.squeeze(recon, axis=-1)
    losses = []
    for n_fft, hop, win in STFT_ARGS:
        s_t = spectral(target, n_fft, hop, win)
        s_r = spectral(recon, n_fft, hop, win)
        losses.append(frobenius_norm(s_t - s_r) / frobenius_norm(s_t))
    return jnp.mean(jnp.stack(losses, axis=-1), axis=-1)
