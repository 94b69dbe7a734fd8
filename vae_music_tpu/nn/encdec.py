"""Encoder/Decoder conv stacks for the waveform VQ-VAE.

Functional mirror of /root/reference/encdec.py:
  * ``EncoderConvBlock`` (:17-41): ``down_depth`` x [strided Conv1D(k=2*stride)
    + DilatedResnet1D], then a k=3 projection conv to ``output_dim``
  * ``DecoderConvBlock`` (:44-71): k=3 pre-projection, then ``down_depth`` x
    [DilatedResnet1D (reversed dilation) + Conv1DTranspose(k=2*stride)]
    with the final upsample mapping to ``output_dim``
  * ``Encoder`` (:74-108): one EncoderConvBlock per level (depth == len(down_depth))
  * ``Decoder`` (:114-151): mirrored blocks in reverse + final k=3 conv to
    the audio channel count.

All shapes static; strided convs keep T divisible so every level's code grid
is exact (cfg.validate() enforces divisibility up front).
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from vae_music_tpu.nn.resnet import DilatedResnet1D


class EncoderConvBlock(nn.Module):
    output_dim: int
    embed_width: int
    embed_depth: int
    dilation_factor: int = 1
    stride: int = 2
    down_depth: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.stride * 2
        for _ in range(self.down_depth):
            x = nn.Conv(self.embed_width, (k,), strides=(self.stride,),
                        padding="SAME", dtype=self.dtype)(x)
            x = DilatedResnet1D(self.embed_width, self.embed_depth,
                                dilation_factor=self.dilation_factor,
                                dtype=self.dtype)(x)
        return nn.Conv(self.output_dim, (3,), padding="SAME", dtype=self.dtype)(x)


class DecoderConvBlock(nn.Module):
    output_dim: int
    embed_width: int
    embed_depth: int
    dilation_factor: int = 1
    reverse_dilation: bool = True
    dilation_cycle: Optional[int] = None
    stride: int = 2
    down_depth: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.stride * 2
        x = nn.Conv(self.embed_width, (3,), padding="SAME", dtype=self.dtype)(x)
        for i in range(self.down_depth):
            x = DilatedResnet1D(self.embed_width, self.embed_depth,
                                dilation_factor=self.dilation_factor,
                                reverse_dilation=self.reverse_dilation,
                                dilation_cycle=self.dilation_cycle,
                                dtype=self.dtype)(x)
            out_ch = self.output_dim if i == self.down_depth - 1 else self.embed_width
            x = nn.ConvTranspose(out_ch, (k,), strides=(self.stride,),
                                 padding="SAME", dtype=self.dtype)(x)
        return x


class Encoder(nn.Module):
    output_dim: int
    residual_width: int
    residual_depth: int
    depth: int
    down_depth: Sequence[int]
    strides: Sequence[int]
    dilation_factor: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        assert self.depth == len(self.down_depth) == len(self.strides)
        for down, stride in zip(self.down_depth, self.strides):
            x = EncoderConvBlock(self.output_dim, self.residual_width,
                                 self.residual_depth,
                                 dilation_factor=self.dilation_factor,
                                 stride=stride, down_depth=down,
                                 dtype=self.dtype)(x)
        return x


class Decoder(nn.Module):
    output_dim: int          # audio channels
    embed_width: int         # latent dim (decoder input width)
    residual_width: int
    residual_depth: int
    depth: int
    down_depth: Sequence[int]
    strides: Sequence[int]
    dilation_factor: int = 1
    reverse_dilation: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        assert self.depth == len(self.down_depth) == len(self.strides)
        # Mirror the encoder: top block first (encdec.py:142).
        for down, stride in reversed(list(zip(self.down_depth, self.strides))):
            x = DecoderConvBlock(self.embed_width, self.residual_width,
                                 self.residual_depth,
                                 dilation_factor=self.dilation_factor,
                                 reverse_dilation=self.reverse_dilation,
                                 stride=stride, down_depth=down,
                                 dtype=self.dtype)(x)
        return nn.Conv(self.output_dim, (3,), padding="SAME", dtype=self.dtype)(x)
