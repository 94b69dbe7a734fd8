"""Autoregressive priors over VQ code grids.

``FMHAPrior`` is the production prior/upsampler network — the functional
mirror of /root/reference/src/autoregressive/autoregressive_fmha.py:13-160:

  * token embedding x sqrt(d_model) (:117-131)
  * the genre embedding (y_cond) REPLACES the start-token embedding at
    position 0 (:120-129)
  * trainable positional embedding (or sinusoidal table) (:133-137)
  * upper-level codes (x_cond) upsampled by ConditionerNet and ADDED to the
    token embeddings (:141-151)
  * FactorizedTransformer stack -> Dense(bins) logits (:153-158)

``Prior`` is the trainer binding of /root/reference/prior.py:102-335: a frozen
VQ-VAE encodes raw audio to codes; input = codes shifted right with start-token
pad ``bins-1``; scheduled-sampling/teacher-forcing mix; token CE loss,
accuracy, perplexity.  Here it is a thin composition object — the jitted step
lives in vae_music_tpu.train.prior_step.

Token sampling lives in vae_music_tpu.sample (KV-cached lax.scan decode); the
reference re-runs the full prefix per token (autoregressive_fmha.py:199-203).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vae_music_tpu.configs import PriorConfig, VQVAEConfig
from vae_music_tpu.models.conditioners import ConditionerNet, LabelConditioner
from vae_music_tpu.nn.positional import PositionalEmbedding, sinusoidal_encoding
from vae_music_tpu.nn.transformer import FactorizedTransformer


class FMHAPrior(nn.Module):
    cfg: PriorConfig
    ctx_len: int                       # code-grid length at this level
    cond_length: Optional[int] = None  # upper-level code length (if conditioned)
    cond_down_depth: Optional[int] = None
    cond_stride: Optional[int] = None

    @property
    def start_token(self) -> int:
        return self.cfg.bins - 1  # autoregressive_fmha.py:63

    def setup(self):
        c = self.cfg
        dtype = jnp.dtype(c.dtype)
        self.x_embedding = nn.Embed(c.bins, c.width, dtype=dtype, name="x_embedding")
        if c.pos_emb:
            self.x_pos_embedding = PositionalEmbedding(self.ctx_len, c.width,
                                                       name="x_pos_embedding")
        self.transformer = FactorizedTransformer(
            ctx_len=self.ctx_len, num_heads=c.heads, depth=c.depth,
            d_model=c.width, blocks=c.blocks, attn_stacks=c.attn_stacks,
            m_attn=c.m_attn, m_mlp=c.m_mlp, dropout=c.dropout, dtype=dtype,
            remat=c.remat, use_flash=c.flash_attention, name="transformer")
        self.out = nn.Dense(c.bins, dtype=dtype, name="out")
        self.embed_dropout = nn.Dropout(c.dropout)
        if c.conditioner is not None:
            k = c.conditioner
            assert self.cond_length is not None
            self.conditioner = ConditionerNet(
                cond_length=self.cond_length, bins=c.bins, embed_width=c.width,
                residual_width=k.residual_width, residual_depth=k.residual_depth,
                down_depth=self.cond_down_depth, stride=self.cond_stride,
                dilation_factor=k.dilation_factor, dilation_cycle=k.dilation_cycle,
                dtype=dtype, name="conditioner")
        if c.genre_classes is not None:
            self.label_conditioner = LabelConditioner(
                genre_bins=c.genre_classes, width=c.width, dtype=dtype,
                name="label_conditioner")

    def upsample_cond(self, z_cond: jnp.ndarray) -> jnp.ndarray:
        """Upper-level codes (N, L_up) -> conditioning stream (N, ctx_len, width)."""
        return self.conditioner(z_cond)

    def embed_labels(self, y: jnp.ndarray) -> jnp.ndarray:
        """Genre labels (N,) -> (N, 1, width)."""
        return self.label_conditioner(y)

    def embed_tokens(self, tokens: jnp.ndarray,
                     y_cond: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Embedding + start-token swap + sqrt(d) scaling (:117-131)."""
        x = self.x_embedding(tokens)
        if y_cond is not None:
            x = jnp.concatenate([y_cond.astype(x.dtype), x[:, 1:]], axis=1)
        return x * jnp.sqrt(jnp.float32(self.cfg.width)).astype(x.dtype)

    def positional(self, seq_len: int) -> jnp.ndarray:
        if self.cfg.pos_emb:
            return self.x_pos_embedding(seq_len)
        return sinusoidal_encoding(self.ctx_len, self.cfg.width)[:, :seq_len]

    def __call__(
        self,
        tokens: jnp.ndarray,                       # (N, T) int codes (shifted right)
        x_cond: Optional[jnp.ndarray] = None,      # (N, L_up) codes or (N, T, width) stream
        y_cond: Optional[jnp.ndarray] = None,      # (N, 1, width) label embedding
        *,
        train: bool = False,
        collect_weights: bool = False,
    ) -> Tuple[jnp.ndarray, dict]:
        seq_len = tokens.shape[1]
        x = self.embed_tokens(tokens, y_cond)
        x = x + self.positional(seq_len).astype(x.dtype)
        x = self.embed_dropout(x, deterministic=not train)
        if x_cond is not None:
            if x_cond.ndim == 2:  # raw upper-level codes -> upsample here (:150-151)
                x_cond = self.upsample_cond(x_cond)
            x = x + x_cond[:, :seq_len].astype(x.dtype)
        x, attn_weights = self.transformer(x, train=train,
                                           collect_weights=collect_weights)
        return self.out(x), attn_weights


# ---------------------------------------------------------------------------
# Level wiring (prior.py:102-160, Sampler.py:14-26)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class LevelSpec:
    """Static geometry of one prior level."""

    level: int
    ctx_len: int
    cond_downsample_rate: Optional[int]  # strides[l+1]**downs[l+1], None at top
    cond_length: Optional[int]


def level_spec(vqvae_cfg: VQVAEConfig, level: int) -> LevelSpec:
    z_lengths = vqvae_cfg.z_lengths
    if level != vqvae_cfg.levels - 1:
        cond_level = level + 1
        rate = vqvae_cfg.strides[cond_level] ** vqvae_cfg.down_depth[cond_level]
        return LevelSpec(level, z_lengths[level], rate, z_lengths[level] // rate)
    return LevelSpec(level, z_lengths[level], None, None)


def build_fmha_prior(vqvae_cfg: VQVAEConfig, prior_cfg: PriorConfig) -> FMHAPrior:
    spec = level_spec(vqvae_cfg, prior_cfg.level)
    kwargs = {}
    if prior_cfg.conditioner is not None:
        cond_level = prior_cfg.level + 1
        kwargs = dict(cond_length=spec.cond_length,
                      cond_down_depth=vqvae_cfg.down_depth[cond_level],
                      cond_stride=vqvae_cfg.strides[cond_level])
    return FMHAPrior(cfg=prior_cfg, ctx_len=spec.ctx_len, **kwargs)


def get_cond(zs: Sequence[jnp.ndarray], spec: LevelSpec, start: int, end: int):
    """Slice upper-level codes matching [start, end) of the current level
    (autoregressive_fmha.py:82-105)."""
    if spec.cond_downsample_rate is None:
        return None
    rate = spec.cond_downsample_rate
    assert start % rate == end % rate == 0
    z_cond = zs[spec.level + 1][:, start // rate : end // rate]
    assert z_cond.shape[1] == (end - start) // rate
    return z_cond


def shift_right_with_start(codes: jnp.ndarray, start_token: int) -> jnp.ndarray:
    """Input = codes shifted right, start-token padded (prior.py:224-226)."""
    return jnp.pad(codes[:, :-1], ((0, 0), (1, 0)), constant_values=start_token)


def token_loss(targets: jnp.ndarray, logits: jnp.ndarray) -> jnp.ndarray:
    """Mean sparse CE over all tokens (autoregressive.py:189-201)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None].astype(jnp.int32),
                               axis=-1)[..., 0]
    return jnp.mean(nll)


def token_accuracy(targets: jnp.ndarray, logits: jnp.ndarray) -> jnp.ndarray:
    """Mean exact-match accuracy (autoregressive.py:203-212)."""
    pred = jnp.argmax(logits, axis=-1)
    return jnp.mean((pred == targets).astype(jnp.float32))
