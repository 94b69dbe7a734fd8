"""Multi-level VQ-VAE over raw waveforms.

Mirrors /root/reference/vqvae.py: Jukebox-style *independent* (non-hierarchical)
per-level VQ-VAEs — level ``l`` owns its Encoder (depth ``l+1``,
``down_depth[:l+1]``, ``strides[:l+1]``; vqvae.py:55-59), Decoder (:65-69) and
EMA codebook (:47-49).  Per-level loss = reconstruction MSE + multiscale
spectral loss + commitment (:125-131); all levels trained under one gradient
(:142-144).

Here the module tree holds only the *trainable* conv stacks; the EMA codebook
states live outside as an explicit tuple of ``CodebookState`` threaded through
the train step (see vae_music_tpu.train.vqvae_step).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vae_music_tpu.configs import VQVAEConfig
from vae_music_tpu.data.stft import multiscale_spectral_loss
from vae_music_tpu.nn.encdec import Decoder, Encoder
from vae_music_tpu.nn.quantizer import CodebookState, VQOutput, codebook_lookup, init_codebook, quantize


class VQVAE(nn.Module):
    """Encoder/decoder stacks for all levels (trainable params only)."""

    cfg: VQVAEConfig

    def setup(self):
        c = self.cfg
        dtype = jnp.dtype(c.dtype)
        self.encoders = [
            Encoder(output_dim=c.latent_dim, residual_width=c.residual_width,
                    residual_depth=c.residual_depth, depth=level + 1,
                    down_depth=c.down_depth[: level + 1], strides=c.strides[: level + 1],
                    dilation_factor=c.dilation_factor, dtype=dtype,
                    name=f"encoder_{level}")
            for level in range(c.levels)
        ]
        self.decoders = [
            Decoder(output_dim=c.channels, embed_width=c.latent_dim,
                    residual_width=c.residual_width, residual_depth=c.residual_depth,
                    depth=level + 1, down_depth=c.down_depth[: level + 1],
                    strides=c.strides[: level + 1], dilation_factor=c.dilation_factor,
                    dtype=dtype, name=f"decoder_{level}")
            for level in range(c.levels)
        ]

    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        # Init-time convenience: touch every level so all params materialize.
        return [self.decoders[l](self.encoders[l](x)) for l in range(self.cfg.levels)]

    def encode_level(self, x: jnp.ndarray, level: int) -> jnp.ndarray:
        return self.encoders[level](x)

    def decode_level(self, zq_embed: jnp.ndarray, level: int) -> jnp.ndarray:
        return self.decoders[level](zq_embed)


def init_vqvae(rng: jax.Array, cfg: VQVAEConfig):
    """Returns (params, codebooks) for a fresh model."""
    cfg.validate()
    p_rng, *cb_rngs = jax.random.split(rng, cfg.levels + 1)
    model = VQVAE(cfg)
    x = jnp.zeros((1, cfg.sample_length, cfg.channels), jnp.float32)
    params = model.init(p_rng, x)
    codebooks = tuple(
        init_codebook(cb_rngs[l], cfg.latent_dim, cfg.codebook_size)
        for l in range(cfg.levels)
    )
    return params, codebooks


def vqvae_apply_level(
    params,
    codebook: CodebookState,
    cfg: VQVAEConfig,
    x: jnp.ndarray,
    level: int,
    *,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    mesh=None,
    use_pallas: Optional[bool] = None,
) -> Tuple[jnp.ndarray, VQOutput]:
    """Full forward of one level: encode -> quantize -> decode.

    Returns (reconstruction, VQOutput).  The VQOutput carries the updated
    codebook state when ``train``.  ``mesh``/``use_pallas`` steer the fused
    VQ-kernel dispatch (see nn.quantizer.quantize).
    """
    model = VQVAE(cfg)
    z_e = model.apply(params, x, level, method=VQVAE.encode_level)
    vq = quantize(codebook, z_e, beta=cfg.commit_beta, decay=cfg.ema_decay,
                  usage_threshold=cfg.usage_threshold, train=train, rng=rng,
                  mesh=mesh, use_pallas=use_pallas)
    recon = model.apply(params, vq.quantized, level, method=VQVAE.decode_level)
    return recon, vq


def vqvae_level_losses(cfg: VQVAEConfig, x: jnp.ndarray, recon: jnp.ndarray,
                       vq: VQOutput) -> dict:
    """Reference loss decomposition (vqvae.py:125-131)."""
    recon_loss = jnp.mean(jnp.square(x - recon))
    spectral = (jnp.mean(multiscale_spectral_loss(x, recon))
                if cfg.use_spectral_loss else jnp.zeros(()))
    level_loss = recon_loss + vq.commitment_loss + spectral
    return {
        "level_loss": level_loss,
        "recon_loss": recon_loss,
        "vq_loss": vq.commitment_loss,
        "spectral_loss": spectral,
    }


def vqvae_apply(
    params,
    codebooks: Sequence[CodebookState],
    cfg: VQVAEConfig,
    x: jnp.ndarray,
    *,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    mesh=None,
    use_pallas: Optional[bool] = None,
):
    """All-level forward (vqvae.py:178-206).

    Returns (recons per level, total_loss, new_codebooks, metrics).
    """
    recons, new_codebooks = [], []
    total = jnp.zeros(())
    metrics: dict = {}
    agg = {"recon_loss": 0.0, "vq_loss": 0.0, "spectral_loss": 0.0}
    for level in range(cfg.levels):
        level_rng = jax.random.fold_in(rng, level) if rng is not None else None
        recon, vq = vqvae_apply_level(params, codebooks[level], cfg, x, level,
                                      train=train, rng=level_rng, mesh=mesh,
                                      use_pallas=use_pallas)
        losses = vqvae_level_losses(cfg, x, recon, vq)
        recons.append(recon)
        new_codebooks.append(vq.state)
        total = total + losses["level_loss"]
        for k, v in losses.items():
            metrics[f"[{level}]{k}"] = v
        for k in agg:
            agg[k] += losses[k]
        for k, v in vq.metrics.items():
            metrics[f"[{level}]{k}"] = v
    metrics.update(loss=total, recon_loss=agg["recon_loss"],
                   vqvae_loss=agg["vq_loss"], spectral_loss=agg["spectral_loss"])
    return recons, total, tuple(new_codebooks), metrics


def vqvae_encode(
    params,
    codebooks: Sequence[CodebookState],
    cfg: VQVAEConfig,
    x: jnp.ndarray,
    start_level: int = 0,
    end_level: Optional[int] = None,
    *,
    mesh=None,
    use_pallas: Optional[bool] = None,
) -> List[jnp.ndarray]:
    """Integer code grids per level in [start_level, end_level) (vqvae.py:221-236).

    On a single-chip TPU backend the codebook assignment auto-routes through
    the fused Pallas kernel (ops/vq_pallas.py).
    """
    if end_level is None:
        end_level = cfg.levels
    model = VQVAE(cfg)
    zs = []
    for level in range(start_level, end_level):
        z_e = model.apply(params, x, level, method=VQVAE.encode_level)
        vq = quantize(codebooks[level], z_e, beta=cfg.commit_beta, train=False,
                      mesh=mesh, use_pallas=use_pallas)
        zs.append(vq.codes)
    return zs


def vqvae_decode(
    params,
    codebooks: Sequence[CodebookState],
    cfg: VQVAEConfig,
    codes: jnp.ndarray,
    level: int = 0,
) -> jnp.ndarray:
    """Codes (N, T_level) -> waveform (N, T, channels) (vqvae.py:238-260)."""
    quantized = codebook_lookup(codes, codebooks[level].embeddings)
    model = VQVAE(cfg)
    return model.apply(params, quantized, level, method=VQVAE.decode_level)
