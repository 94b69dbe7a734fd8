"""Conditioning networks.

  * ``ConditionerNet`` — upper-level code upsampler
    (/root/reference/src/conditioner/conditioners.py:9-91): Embedding(bins, width)
    -> DecoderConvBlock (transposed convs, cyclic dilation, reverse_dilation=False)
    upsampling time by ``stride**down_depth`` -> LayerNorm.  Output width equals
    the prior's d_model so it can be added to token embeddings.
  * ``LabelConditioner`` — genre embedding
    (/root/reference/src/conditioner/label_conditioners.py:9-45):
    Embedding(genre_bins, width); (N,) -> (N, 1, width).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from vae_music_tpu.nn.encdec import DecoderConvBlock


class ConditionerNet(nn.Module):
    cond_length: int          # upper-level code-grid length L_up
    bins: int                 # codebook size of the upper-level codes
    embed_width: int          # d_model of the prior (output width)
    residual_width: int
    residual_depth: int
    down_depth: int           # upsampling = stride ** down_depth
    stride: int
    dilation_factor: int = 1
    reverse_dilation: bool = False
    dilation_cycle: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, codes: jnp.ndarray) -> jnp.ndarray:
        n, l = codes.shape
        assert l == self.cond_length, f"upper-level length {l} != {self.cond_length}"
        x = nn.Embed(self.bins, self.embed_width, dtype=self.dtype,
                     name="cond_embedding")(codes)
        x = DecoderConvBlock(
            output_dim=self.embed_width, embed_width=self.residual_width,
            embed_depth=self.residual_depth, dilation_factor=self.dilation_factor,
            reverse_dilation=self.reverse_dilation, dilation_cycle=self.dilation_cycle,
            stride=self.stride, down_depth=self.down_depth, dtype=self.dtype,
            name="upsampler")(x)
        x = nn.LayerNorm(epsilon=1e-6, name="ln")(x)
        assert x.shape[1] == self.cond_length * (self.stride**self.down_depth)
        return x


class LabelConditioner(nn.Module):
    genre_bins: int
    width: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, y: jnp.ndarray) -> jnp.ndarray:
        out = nn.Embed(self.genre_bins, self.width, dtype=self.dtype,
                       name="genre_emb")(y)
        return out[:, None, :]
