"""Evaluation/inspection workhorse.

Functional mirror of /root/reference/utils/tf_utils.py:
  * ``plot_attention_weights`` (:42-67): per-head attention heatmaps
  * ``plot_codebook_usage`` (:82-90): codebook usage bar chart
  * ``plot_waveforms`` (:102-150 style waveplots)
  * ``generate_and_save_waves`` (:76-228): reconstruct via the VQ-VAE,
    decode given latent codes, and/or sample — mode 0: prior sampling with
    ground-truth upper codes; mode 1: single-level prior sampling; mode 2:
    full ancestral sampler chain — then decode to audio and dump WAV/plots.

Matplotlib is optional (plots are skipped when unavailable); WAV dumps use
the stdlib writer.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from vae_music_tpu.train.metrics import codebook_usage_report, write_wav


def _plt():
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        return plt
    except Exception:
        return None


def plot_attention_weights(attention_heads: np.ndarray, path: str,
                           name: str = "attention") -> bool:
    """attention_heads: (H, Lq, Lk) -> grid of heatmaps saved to path."""
    plt = _plt()
    if plt is None:
        return False
    heads = np.asarray(attention_heads)
    h = heads.shape[0]
    fig = plt.figure(figsize=(12, 6))
    for i in range(h):
        ax = fig.add_subplot(2, max(1, (h + 1) // 2), i + 1)
        ax.matshow(heads[i])
        ax.set_xlabel(f"Head {i + 1}")
    plt.tight_layout()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fig.savefig(path)
    plt.close(fig)
    return True


def plot_codebook_usage(n_t: np.ndarray, path: str) -> bool:
    plt = _plt()
    if plt is None:
        return False
    n_t = np.asarray(n_t)
    fig = plt.figure(figsize=(10, 5))
    plt.title("VQ Codebook Vector Usage Count")
    plt.bar(np.arange(len(n_t)), n_t)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fig.savefig(path)
    plt.close(fig)
    return True


def plot_waveforms(waves: np.ndarray, path: str, sample_rate: int = 3000) -> bool:
    plt = _plt()
    if plt is None:
        return False
    waves = np.asarray(waves)
    n = min(len(waves), 12)
    fig = plt.figure(figsize=(18, 12))
    for i in range(n):
        ax = fig.add_subplot(4, 3, i + 1)
        w = waves[i].reshape(-1)
        ax.plot(np.arange(len(w)) / sample_rate, w, linewidth=0.5)
        ax.set_xlabel("s")
    plt.tight_layout()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fig.savefig(path)
    plt.close(fig)
    return True


def generate_and_save_waves(
    vqvae_params,
    codebooks,
    vqvae_cfg,
    test_sample,
    out_dir: str,
    *,
    epoch: int = 0,
    level: int = 0,
    if_decode: bool = False,
    latent_code: Optional[jnp.ndarray] = None,
    if_sample: bool = False,
    sample_mode: int = 0,
    sampler=None,                    # AncestralSampler, for sample_mode 2
    prior_decode_fn=None,            # (rng) -> tokens, for sample_mode 0/1
    rng: Optional[jax.Array] = None,
    print_codebook_distribution: bool = False,
    sample_rate: int = 3000,
) -> dict:
    """Reconstruct / decode / sample and dump WAVs+plots.  Returns artifacts."""
    from vae_music_tpu.models.vqvae import vqvae_apply_level, vqvae_decode

    artifacts = {}
    os.makedirs(out_dir, exist_ok=True)

    if print_codebook_distribution:
        n_t = np.asarray(codebooks[level].N_t)
        artifacts["codebook_report"] = codebook_usage_report(n_t)
        plot_codebook_usage(n_t, os.path.join(out_dir, f"usage_e{epoch}.png"))

    # 1. Direct reconstruction x -> x' (tf_utils.py:97-101).
    x = test_sample[0] if isinstance(test_sample, tuple) else test_sample
    recon, _vq = vqvae_apply_level(vqvae_params, codebooks[level], vqvae_cfg,
                                   jnp.asarray(x), level, train=False)
    recon = np.asarray(recon)
    artifacts["reconstructions"] = recon
    plot_waveforms(recon, os.path.join(out_dir, f"recon_e{epoch}.png"), sample_rate)
    for i in range(min(len(recon), 4)):
        write_wav(os.path.join(out_dir, f"recon_e{epoch}_{i}.wav"),
                  recon[i], sample_rate)

    # 2. Decode given latent codes (e.g. prior predictions) (tf_utils.py:156-182).
    if if_decode and latent_code is not None:
        decoded = np.asarray(vqvae_decode(vqvae_params, codebooks, vqvae_cfg,
                                          jnp.asarray(latent_code), level))
        artifacts["decoded"] = decoded
        for i in range(min(len(decoded), 4)):
            write_wav(os.path.join(out_dir, f"decoded_e{epoch}_{i}.wav"),
                      decoded[i], sample_rate)

    # 3. Sample (tf_utils.py:184-226).
    if if_sample:
        assert rng is not None
        if sample_mode == 2:
            assert sampler is not None
            wav = np.asarray(sampler.sample_audio(
                min(len(np.asarray(x)), 4), rng))
        else:
            assert prior_decode_fn is not None
            tokens = prior_decode_fn(rng)
            wav = np.asarray(vqvae_decode(vqvae_params, codebooks, vqvae_cfg,
                                          tokens[:, 1:], level))
        artifacts["sampled"] = wav
        for i in range(min(len(wav), 4)):
            write_wav(os.path.join(out_dir, f"sampled_e{epoch}_{i}.wav"),
                      wav[i], sample_rate)
    return artifacts
