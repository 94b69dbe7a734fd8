"""Spectral-loss parity tests against reference semantics
(/root/reference/data_utils.py:19-40, vqvae.py:309-326)."""

import jax.numpy as jnp
import numpy as np
import pytest

from vae_music_tpu.data.stft import (
    STFT_ARGS,
    frame,
    frobenius_norm,
    multiscale_spectral_loss,
    spectral,
)


def _np_stft_mag(x, n_fft, hop, win):
    """Reference magnitude STFT matching tf.signal.stft defaults:
    periodic hann, no end padding, zero-pad frames to n_fft."""
    num_frames = 1 + (len(x) - win) // hop
    n = np.arange(win)
    hann = 0.5 - 0.5 * np.cos(2 * np.pi * n / win)
    out = np.empty((num_frames, n_fft // 2 + 1))
    for f in range(num_frames):
        seg = x[f * hop : f * hop + win] * hann
        out[f] = np.abs(np.fft.rfft(seg, n=n_fft))
    return out


def test_frame_shape_and_content():
    x = jnp.arange(100.0)
    frames = frame(x, 30, 10)
    assert frames.shape == (8, 30)  # 1 + (100-30)//10
    np.testing.assert_array_equal(np.asarray(frames[0]), np.arange(30.0))
    np.testing.assert_array_equal(np.asarray(frames[3]), np.arange(30.0, 60.0))


@pytest.mark.parametrize("n_fft,hop,win", STFT_ARGS)
def test_spectral_matches_numpy(n_fft, hop, win):
    rng = np.random.default_rng(0)
    x = rng.standard_normal(4000).astype(np.float32)
    got = np.asarray(spectral(jnp.asarray(x), n_fft, hop, win))
    want = _np_stft_mag(x, n_fft, hop, win)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_multiscale_loss_zero_for_identical():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 3072, 1)).astype(np.float32))
    loss = multiscale_spectral_loss(x, x)
    assert loss.shape == (2,)
    np.testing.assert_allclose(np.asarray(loss), 0.0, atol=1e-6)


def test_multiscale_loss_relative_scaling():
    # loss = ||S_x - S_r||_F / ||S_x||_F : recon==0 gives exactly 1.0 per scale.
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 3072, 1)).astype(np.float32))
    loss = multiscale_spectral_loss(x, jnp.zeros_like(x))
    np.testing.assert_allclose(np.asarray(loss), 1.0, rtol=1e-5)


def test_frobenius_norm():
    x = jnp.asarray([[[3.0, 4.0], [0.0, 0.0]]])
    np.testing.assert_allclose(np.asarray(frobenius_norm(x)), [5.0])
