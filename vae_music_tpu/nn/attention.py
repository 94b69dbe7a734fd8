"""Jukebox-style factorized (sparse) attention.

Functional mirror of /root/reference/src/transformer/factorized_attention.py:
a length-T sequence is viewed as a 2-D grid of (blocks x block_len) and each
layer attends with one of three patterns (:42-47):

  * ``row``      (:74-141):  causal attention within the current block
  * ``col``      (:210-286): attends the same column offset across all
                             previous blocks (incl. the diagonal), via a
                             transpose of the block grid
  * ``prev_row`` (:308-388): attends the whole previous block, zero-K/V
                             (hence zero output) for the first block

QKV come from one *causal* Conv1D(k=3) (:36), followed by per-head q/k/v
projections and an output projection (the keras MultiHeadAttention
parametrization, :39-40), then a final projection back to d_model (:50).

Complexity: O(T*block_len + T*blocks) instead of O(T^2) — the reference's
algorithmic long-context story (SURVEY.md §5).  On TPU every pattern is pure
reshape/transpose + batched MXU matmuls; the (N*blocks, l, l) score tensors
tile cleanly.  Arbitrary prefix lengths (used when validating against
incremental decode) are handled with the same trailing-partial-block split as
the reference (:105-135).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from vae_music_tpu.nn.resnet import TapConv3, default_conv_impl

ROW, COL, PREV_ROW = 0, 1, 2
PATTERN_NAMES = {ROW: "row", COL: "col", PREV_ROW: "prev_row"}


def _flash_attention():
    """JAX's bundled TPU flash-attention Pallas op (fwd + custom-VJP bwd),
    or None when unavailable."""
    try:
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            flash_attention)

        return flash_attention
    except Exception:  # pragma: no cover
        return None


def flash_ok(lq: int, block_len: int, hd: int) -> bool:
    """Whether the blockwise row/prev_row patterns can use the fused flash
    kernel: TPU backend, full blocks only (training always is), and
    MXU-aligned geometry.

    Measured on v5e at the Jukebox flagship training geometry (batch 4, ctx
    8192, block_len 1024, heads 2, hd 128, bf16, fwd+bwd): flash 7.75/8.86 ms
    vs XLA 6.99/6.59 ms for row/prev_row — XLA's fusion already wins because
    the per-block score tensors tile cleanly, so ``use_flash`` defaults to
    False and exists for wider-block geometries where the (N*blocks, H, l, l)
    scores stop fitting; equivalence vs the dense path verified to 7.8e-3
    (bf16) for outputs and grads.
    """
    import jax

    # The kernel is TPU-only; TPU plugin backends report platform names like
    # 'axon', so exclude the known non-TPU backends rather than matching.
    return (_flash_attention() is not None
            and jax.default_backend() not in ("cpu", "gpu", "cuda", "rocm")
            and lq % block_len == 0
            and block_len % 128 == 0
            and hd % 128 == 0)


def causal_mask(q_len: int, k_len: int) -> jnp.ndarray:
    """Boolean keep-mask, True = attend (multi_head_attention.py:17-20)."""
    return jnp.tril(jnp.ones((q_len, k_len), jnp.bool_))


def masked_mha(
    q: jnp.ndarray,  # (B, Lq, H, hd)
    k: jnp.ndarray,  # (B, Lk, H, hd)
    v: jnp.ndarray,  # (B, Lk, H, hd)
    mask: Optional[jnp.ndarray] = None,  # (Lq, Lk) keep-mask
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scaled dot-product attention over pre-split heads.

    Returns (out (B, Lq, H, hd), weights (B, H, Lq, Lk)).
    """
    hd = q.shape[-1]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) / math.sqrt(hd)
    if mask is not None:
        logits = jnp.where(mask[None, None], logits, jnp.float32(-1e9))
    weights = nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", weights.astype(v.dtype), v)
    return out, weights


def row_attn(q, k, v, block_len: int, *, use_flash: bool = False):
    """Causal within-block attention (factorized_attention.py:74-141)."""
    n, lq, h, hd = q.shape
    trail = lq % block_len
    num_blocks = lq // block_len

    if use_flash and flash_ok(lq, block_len, hd):
        grid = lambda t: (t.reshape(n * num_blocks, block_len, h, hd)
                          .transpose(0, 2, 1, 3))
        o = _flash_attention()(grid(q), grid(k), grid(v), causal=True,
                               sm_scale=1.0 / math.sqrt(hd))
        return (o.transpose(0, 2, 1, 3).reshape(n, lq, h, hd), None)

    outs = []
    if num_blocks > 0:
        body = lambda t: t[:, : num_blocks * block_len].reshape(
            n * num_blocks, block_len, h, hd)
        out, w = masked_mha(body(q), body(k), body(v),
                            causal_mask(block_len, block_len))
        outs.append(out.reshape(n, num_blocks * block_len, h, hd))
    if trail > 0:
        out_t, w = masked_mha(q[:, -trail:], k[:, -trail:], v[:, -trail:],
                              causal_mask(trail, trail))
        outs.append(out_t)
    return jnp.concatenate(outs, axis=1) if len(outs) > 1 else outs[0], w


def col_attn(q, k, v, block_len: int):
    """Same-column attention across previous blocks (factorized_attention.py:210-286)."""
    n, lq, h, hd = q.shape
    trail = lq % block_len
    num_blocks = lq // block_len

    out_trail = None
    if trail > 0:
        # Trailing offsets attend their column in all full blocks + themselves
        # (:236-254) — concat the trailing entry as the (num_blocks+1)-th key.
        grid = lambda t: t[:, : num_blocks * block_len].reshape(
            n, num_blocks, block_len, h, hd)[:, :, :trail]
        k_cur = jnp.concatenate([grid(k), k[:, None, -trail:]], axis=1)  # (N, B+1, trail, H, hd)
        v_cur = jnp.concatenate([grid(v), v[:, None, -trail:]], axis=1)
        k_cur = k_cur.transpose(0, 2, 1, 3, 4).reshape(n * trail, num_blocks + 1, h, hd)
        v_cur = v_cur.transpose(0, 2, 1, 3, 4).reshape(n * trail, num_blocks + 1, h, hd)
        q_cur = q[:, -trail:].reshape(n * trail, 1, h, hd)
        out_trail, w = masked_mha(q_cur, k_cur, v_cur, mask=None)
        out_trail = out_trail.reshape(n, trail, h, hd)

    # Full blocks: transpose the (blocks, block_len) grid and run causal
    # attention over the blocks axis (:260-278).
    body = lambda t: (t[:, : num_blocks * block_len]
                      .reshape(n, num_blocks, block_len, h, hd)
                      .transpose(0, 2, 1, 3, 4)
                      .reshape(n * block_len, num_blocks, h, hd))
    out, w = masked_mha(body(q), body(k), body(v),
                        causal_mask(num_blocks, num_blocks))
    out = (out.reshape(n, block_len, num_blocks, h, hd)
           .transpose(0, 2, 1, 3, 4)
           .reshape(n, num_blocks * block_len, h, hd))
    if out_trail is not None:
        out = jnp.concatenate([out, out_trail], axis=1)
    return out, w


def prev_row_attn(q, k, v, block_len: int, *, use_flash: bool = False):
    """Whole-previous-block attention, zero block at t=0
    (factorized_attention.py:308-388)."""
    n, lq, h, hd = q.shape
    trail = lq % block_len
    num_blocks = lq // block_len

    if use_flash and flash_ok(lq, block_len, hd):
        # K/V shifted one block forward (zero block prepended): the t=0 case
        # attends all-zero keys -> uniform weights over zero values -> zero
        # output, exactly the reference's semantics (:341-344).
        grid5 = lambda t: t.reshape(n, num_blocks, block_len, h, hd)
        kb = jnp.pad(grid5(k), ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0)))[:, :-1]
        vb = jnp.pad(grid5(v), ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0)))[:, :-1]
        flat = lambda t: (t.reshape(n * num_blocks, block_len, h, hd)
                          .transpose(0, 2, 1, 3))
        o = _flash_attention()(flat(q), flat(kb), flat(vb), causal=False,
                               sm_scale=1.0 / math.sqrt(hd))
        return (o.transpose(0, 2, 1, 3).reshape(n, lq, h, hd), None)

    out_trail = None
    if trail > 0:
        if num_blocks > 0:
            start = (num_blocks - 1) * block_len
            k_cur = k[:, start : start + block_len]
            v_cur = v[:, start : start + block_len]
        else:
            # Zero K/V -> uniform weights over zero values -> zero output (:341-344).
            k_cur = jnp.zeros((n, block_len, h, hd), k.dtype)
            v_cur = jnp.zeros((n, block_len, h, hd), v.dtype)
        out_trail, w = masked_mha(q[:, -trail:], k_cur, v_cur, mask=None)

    body_len = num_blocks * block_len
    qb = q[:, :body_len].reshape(n * num_blocks, block_len, h, hd)
    # Shift K/V forward one block (zero block prepended, current dropped) (:360-373).
    grid = lambda t: t[:, :body_len].reshape(n, num_blocks, block_len, h, hd)
    kb = jnp.pad(grid(k), ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0)))[:, :-1]
    vb = jnp.pad(grid(v), ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0)))[:, :-1]
    kb = kb.reshape(n * num_blocks, block_len, h, hd)
    vb = vb.reshape(n * num_blocks, block_len, h, hd)
    out, w = masked_mha(qb, kb, vb, mask=None)
    out = out.reshape(n, body_len, h, hd)
    if out_trail is not None:
        out = jnp.concatenate([out, out_trail], axis=1)
    return out, w


_PATTERNS = {ROW: row_attn, COL: col_attn, PREV_ROW: prev_row_attn}


class FactorizedAttention(nn.Module):
    """One factorized-attention sublayer (factorized_attention.py:10-72)."""

    ctx_len: int
    num_heads: int
    d_model: int
    blocks: int
    attn_func: int = ROW
    m_attn: float = 0.25
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False  # measured slower than XLA at the flagship geo
                             # (see flash_ok docstring); opt-in for wider blocks
    conv_impl: Optional[str] = None  # None = auto | 'tap' | 'conv' — the QKV
                             # causal conv as three shifted matmuls on TPU
                             # (nn/resnet.py module doc; it is ~half the
                             # layer FLOPs at Jukebox width)

    @property
    def width(self) -> int:
        return int(self.d_model * self.m_attn)

    @property
    def block_len(self) -> int:
        assert self.ctx_len % self.blocks == 0
        return self.ctx_len // self.blocks

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False,
                 return_weights: bool = False):
        w, h = self.width, self.num_heads
        assert w % h == 0
        hd = w // h

        # Single causal conv produces Q,K,V (:36); split then per-head
        # projections + output projection (keras MHA parametrization, :39-40).
        impl = self.conv_impl or default_conv_impl(self.dtype, self.d_model,
                                                   3 * w)
        if impl == "tap":
            qkv = TapConv3(3 * w, padding="CAUSAL", dtype=self.dtype,
                           name="qkv_conv")(x)
        else:
            qkv = nn.Conv(3 * w, (3,), padding="CAUSAL", dtype=self.dtype,
                          name="qkv_conv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = nn.DenseGeneral((h, hd), dtype=self.dtype, name="q_proj")(q)
        k = nn.DenseGeneral((h, hd), dtype=self.dtype, name="k_proj")(k)
        v = nn.DenseGeneral((h, hd), dtype=self.dtype, name="v_proj")(v)

        if self.attn_func in (ROW, PREV_ROW) and not return_weights:
            # Heatmap callers (return_weights) stay on the dense path.
            out, weights = _PATTERNS[self.attn_func](
                q, k, v, self.block_len, use_flash=self.use_flash)
        else:
            out, weights = _PATTERNS[self.attn_func](q, k, v, self.block_len)

        out = nn.DenseGeneral(w, axis=(-2, -1), dtype=self.dtype,
                              name="o_proj")(out)
        out = nn.Dense(self.d_model, dtype=self.dtype, name="proj")(out)
        out = nn.Dropout(self.dropout, deterministic=not train)(out)
        if return_weights:
            return out, weights
        return out
