"""Vanilla dense-attention autoregressive prior.

Mirror of /root/reference/autoregressive.py (the pre-Jukebox baseline prior):
  * ``MHASelfAttentionBlock`` (:25-56): post-LN transformer block —
    MHA -> dropout -> LN(x+attn) -> FFN(relu) -> dropout -> LN(out1+ffn)
  * ``MHAAutoregressive`` (:59-139): token embedding x sqrt(d), learned or
    sinusoidal positions, N causal blocks, Dense -> vocab logits
  * greedy sampling (:142-183) — here as a KV-cached ``lax.scan`` decode
    (``make_dense_decode_fn``) instead of the reference's full-prefix
    recompute per token.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from vae_music_tpu.nn.attention import causal_mask, masked_mha
from vae_music_tpu.nn.positional import PositionalEmbedding, sinusoidal_encoding
from vae_music_tpu.sample.decode import SampleMode, sample_token


class MHASelfAttentionBlock(nn.Module):
    d_model: int
    num_heads: int
    dff: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False):
        h = self.num_heads
        hd = self.d_model // h
        q = nn.DenseGeneral((h, hd), dtype=self.dtype, name="q_proj")(x)
        k = nn.DenseGeneral((h, hd), dtype=self.dtype, name="k_proj")(x)
        v = nn.DenseGeneral((h, hd), dtype=self.dtype, name="v_proj")(x)
        attn, weights = masked_mha(q, k, v, causal_mask(x.shape[1], x.shape[1]))
        attn = nn.DenseGeneral(self.d_model, axis=(-2, -1), dtype=self.dtype,
                               name="o_proj")(attn)
        attn = nn.Dropout(self.dropout, deterministic=not train)(attn)
        out1 = nn.LayerNorm(epsilon=1e-6, name="ln1")(x + attn)
        ffn = nn.Dense(self.dff, dtype=self.dtype, name="ffn1")(out1)
        ffn = nn.relu(ffn)
        ffn = nn.Dense(self.d_model, dtype=self.dtype, name="ffn2")(ffn)
        ffn = nn.Dropout(self.dropout, deterministic=not train)(ffn)
        return nn.LayerNorm(epsilon=1e-6, name="ln2")(out1 + ffn), weights


class MHAAutoregressive(nn.Module):
    bins: int
    width: int
    depth: int
    ctx_len: int
    ffn_width: int = 512
    heads: int = 1
    dropout: float = 0.1
    pos_emb: bool = True
    dtype: jnp.dtype = jnp.float32

    @property
    def start_token(self) -> int:
        return self.bins - 1

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, *, train: bool = False):
        x = nn.Embed(self.bins, self.width, dtype=self.dtype,
                     name="x_embedding")(tokens)
        x = x * math.sqrt(self.width)
        seq_len = tokens.shape[1]
        if self.pos_emb:
            x = x + PositionalEmbedding(self.ctx_len, self.width,
                                        name="x_pos_embedding")(seq_len)
        else:
            x = x + sinusoidal_encoding(self.ctx_len, self.width)[:, :seq_len]
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        attn_weights = {}
        for i in range(self.depth):
            x, w = MHASelfAttentionBlock(self.width, self.heads, self.ffn_width,
                                         self.dropout, dtype=self.dtype,
                                         name=f"layer_{i}")(x, train=train)
            attn_weights[f"decoder_layer{i + 1}_attention"] = w
        return nn.Dense(self.bins, dtype=self.dtype, name="out")(x), attn_weights


def make_dense_decode_fn(
    model: MHAAutoregressive,
    n_samples: int,
    *,
    mode: SampleMode = SampleMode.GREEDY,   # reference samples greedily (:163)
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 1.0,
    return_logits: bool = False,
    unroll: int = 1,
):
    """KV-cached greedy/categorical decode for the vanilla prior."""
    width, heads, depth = model.width, model.heads, model.depth
    hd = width // heads
    ctx_len = model.ctx_len
    sqrt_d = math.sqrt(float(width))

    def _ln(x, p):
        x32 = x.astype(jnp.float32)
        mu = jnp.mean(x32, -1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mu), -1, keepdims=True)
        return ((x32 - mu) * jax.lax.rsqrt(var + 1e-6) * p["scale"] + p["bias"]).astype(x.dtype)

    def decode(params, rng):
        p = params["params"]
        emb = p["x_embedding"]["embedding"]
        pos = (p["x_pos_embedding"]["embeddings"] if model.pos_emb
               else sinusoidal_encoding(ctx_len, width)[0])
        layers = [p[f"layer_{i}"] for i in range(depth)]
        out_k, out_b = p["out"]["kernel"], p["out"]["bias"]

        k_cache0 = jnp.zeros((depth, n_samples, ctx_len, heads, hd), jnp.float32)
        v_cache0 = jnp.zeros_like(k_cache0)

        def scan_step(carry, t):
            token, k_cache, v_cache, step_rng = carry
            x = jnp.take(emb, token, axis=0) * sqrt_d
            x = x + jax.lax.dynamic_slice_in_dim(pos, t, 1, axis=0)[0]
            for li, lp in enumerate(layers):
                q = jnp.einsum("nw,whd->nhd", x, lp["q_proj"]["kernel"]) + lp["q_proj"]["bias"]
                k = jnp.einsum("nw,whd->nhd", x, lp["k_proj"]["kernel"]) + lp["k_proj"]["bias"]
                v = jnp.einsum("nw,whd->nhd", x, lp["v_proj"]["kernel"]) + lp["v_proj"]["bias"]
                k_cache = jax.lax.dynamic_update_slice(
                    k_cache, k[None, :, None], (li, 0, t, 0, 0))
                v_cache = jax.lax.dynamic_update_slice(
                    v_cache, v[None, :, None], (li, 0, t, 0, 0))
                logits = jnp.einsum("nhd,nlhd->nhl", q, k_cache[li],
                                    preferred_element_type=jnp.float32) / math.sqrt(hd)
                mask = jnp.arange(ctx_len) <= t
                logits = jnp.where(mask[None, None], logits, jnp.float32(-1e9))
                wts = jax.nn.softmax(logits, axis=-1)
                attn = jnp.einsum("nhl,nlhd->nhd", wts.astype(v.dtype), v_cache[li])
                attn = jnp.einsum("nhd,hdw->nw", attn,
                                  lp["o_proj"]["kernel"]) + lp["o_proj"]["bias"]
                out1 = _ln(x + attn, lp["ln1"])
                ffn = jnp.maximum(out1 @ lp["ffn1"]["kernel"] + lp["ffn1"]["bias"], 0.0)
                ffn = ffn @ lp["ffn2"]["kernel"] + lp["ffn2"]["bias"]
                x = _ln(out1 + ffn, lp["ln2"])
            logits = x @ out_k + out_b
            step_rng, sub = jax.random.split(step_rng)
            nxt = sample_token(sub, logits, mode, temperature, top_k, top_p)
            out = (nxt, logits) if return_logits else nxt
            return (nxt, k_cache, v_cache, step_rng), out

        token0 = jnp.full((n_samples,), model.start_token, jnp.int32)
        _, outs = jax.lax.scan(scan_step,
                               (token0, k_cache0, v_cache0, rng),
                               jnp.arange(ctx_len), unroll=min(unroll, ctx_len))
        if return_logits:
            sampled, logits = outs
            return (jnp.concatenate([token0[:, None], sampled.T], axis=1),
                    jnp.transpose(logits, (1, 0, 2)))
        return jnp.concatenate([token0[:, None], outs.T], axis=1)

    return jax.jit(decode)
