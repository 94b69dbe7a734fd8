"""Residual attention blocks and the factorized transformer.

Mirror of /root/reference/src/transformer/transformer.py:
  * ``ResidualAttnBlock`` (:12-60): out = mlp(LN2(x + attn)) + attn(LN1(x)) + x
    — note the triple-sum residual; the "MLP" is a single Dense of width
    d_model*m_mlp with NO activation (:30)
  * ``FactorizedTransformer`` (:63-115): ``depth`` blocks whose attention
    pattern cycles per layer (attn_stacks=0 -> row/col; 1 -> row/col/prev_row);
    attention weights returned for the first and last layer only (:106-115).
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp

from vae_music_tpu.nn.attention import FactorizedAttention


def attn_pattern_schedule(attn_stacks: int, layer: int) -> int:
    if attn_stacks == 0:
        return (0, 1)[layer % 2]
    if attn_stacks == 1:
        return (0, 1, 2)[layer % 3]
    raise ValueError(f"unknown attn_stacks {attn_stacks}")


class ResidualAttnBlock(nn.Module):
    ctx_len: int
    num_heads: int
    d_model: int
    blocks: int
    attn_func: int = 0
    m_attn: float = 0.25
    m_mlp: float = 1.0
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False  # fused flash kernel when flash_ok (see attention.py)

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False,
                 return_weights: bool = False):
        fmha = FactorizedAttention(
            ctx_len=self.ctx_len, num_heads=self.num_heads, d_model=self.d_model,
            blocks=self.blocks, attn_func=self.attn_func, m_attn=self.m_attn,
            dropout=self.dropout, dtype=self.dtype, use_flash=self.use_flash,
            name="fmha")
        ln1 = nn.LayerNorm(epsilon=1e-6, name="ln1")
        ln2 = nn.LayerNorm(epsilon=1e-6, name="ln2")
        mlp = nn.Dense(int(self.d_model * self.m_mlp), dtype=self.dtype, name="mlp")

        if return_weights:
            res1, weights = fmha(ln1(x), train=train, return_weights=True)
        else:
            res1 = fmha(ln1(x), train=train)
            weights = None
        res2 = mlp(ln2(x + res1))
        out = res2 + res1 + x
        if return_weights:
            return out, weights
        return out


class FactorizedTransformer(nn.Module):
    ctx_len: int
    num_heads: int
    depth: int
    d_model: int
    blocks: int
    attn_stacks: int = 1
    m_attn: float = 0.25
    m_mlp: float = 1.0
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    remat: bool = False   # jax.checkpoint each block: trade FLOPs for HBM
    use_flash: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False,
                 collect_weights: bool = False) -> Tuple[jnp.ndarray, Dict]:
        assert x.shape[-1] == self.d_model
        attention_weights: Dict[str, jnp.ndarray] = {}

        def run_block(blk, xx):
            return blk(xx, train=train)

        if self.remat:
            run_block = nn.remat(run_block)
        for i in range(self.depth):
            block = ResidualAttnBlock(
                ctx_len=self.ctx_len, num_heads=self.num_heads,
                d_model=self.d_model, blocks=self.blocks,
                attn_func=attn_pattern_schedule(self.attn_stacks, i),
                m_attn=self.m_attn, m_mlp=self.m_mlp, dropout=self.dropout,
                dtype=self.dtype, use_flash=self.use_flash, name=f"layer_{i}")
            want_w = collect_weights and (i == 0 or i == self.depth - 1)
            if want_w:
                x, w = block(x, train=train, return_weights=True)
                attention_weights[f"transformer_layer_{i}_attention"] = w
            else:
                x = run_block(block, x)
        return x, attention_weights
