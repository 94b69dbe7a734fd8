"""Tensor-parallel KV-cached decode: caches + attention weights sharded
over the 'model' mesh axis (VERDICT r4 task 3 lever b).

The wide serving batch on ONE chip is capped by KV-cache capacity
(ops/decode_grid_pallas.py module doc: int8 batch-64 caches are 12 GB — the
only fit in 15.75 GB of HBM).  This module breaks that cap the way the
'model' axis was reserved for (docs/ARCHITECTURES.md): each device holds

  * the KV caches of ``heads / D`` heads        — the 12 GB splits D ways,
  * the folded qkv columns of those heads (column-parallel projection),
  * the out-projection ROWS of those heads (row-parallel, psum'd),
  * a replicated copy of the LN / MLP / embedding / head params (the MLP
    is one dense of ~width^2 per layer — 4 MB f32 at width 1024 — so
    replicating it costs nothing next to the caches and avoids a second
    per-layer collective).

One ``psum`` per layer (after the out projection) is the only
communication; everything after it (LN2, MLP, residuals, logits head,
sampling) is replicated compute.  Sampling uses a shared PRNG stream, so
every device samples the SAME token — no divergence, no broadcast.

This is the XLA scan-path decode (sample/decode.py semantics, same
incremental==batch contract) under ``shard_map``; correctness is pinned
against the single-device path on the virtual CPU mesh
(tests/test_multichip.py) and exercised by ``dryrun_multichip``.  On real
multi-chip hardware the psum rides ICI.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vae_music_tpu.configs import PriorConfig
from vae_music_tpu.sample.decode import SampleMode, sample_token

try:  # jax >= 0.7
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

import inspect

_REP_KWARG = ("check_vma" if "check_vma"
              in inspect.signature(shard_map).parameters else "check_rep")


def make_decode_fn_tp(
    cfg: PriorConfig,
    ctx_len: int,
    n_samples: int,
    mesh: Mesh,
    *,
    axis: str = "model",
    mode: SampleMode = SampleMode.GUMBEL,
    temperature: float = 1.0,
    cache_dtype: str = "float32",
    return_logits: bool = False,
):
    """Head-sharded decode: fn(params, rng, x_cond_stream, y_cond) -> tokens.

    ``mesh.shape[axis]`` must divide ``cfg.heads``.  Per-device KV caches
    are ``(N, ctx, heads/D, hd)``; the out-projection partial sums psum over
    ``axis``.  Output tokens (and logits) are replicated.
    """
    width = cfg.width
    heads = cfg.heads
    attn_w = cfg.attn_width
    hd = attn_w // heads
    depth = cfg.depth
    blocks = cfg.blocks
    assert ctx_len % blocks == 0
    block_len = ctx_len // blocks
    start_token = cfg.bins - 1
    sqrt_d = math.sqrt(float(width))
    n_dev = mesh.shape[axis]
    assert heads % n_dev == 0, (heads, n_dev)
    h_loc = heads // n_dev
    xla_cdt = jnp.dtype(cache_dtype)
    assert xla_cdt != jnp.dtype(jnp.int8), "TP decode: float caches only"

    def decode(params, rng, x_cond_stream=None, y_cond=None):
        p = params["params"]
        emb = p["x_embedding"]["embedding"]
        if cfg.pos_emb:
            pos = p["x_pos_embedding"]["embeddings"]
        else:
            from vae_music_tpu.nn.positional import sinusoidal_encoding

            pos = sinusoidal_encoding(ctx_len, width)[0]

        def fold_layer(lp):
            # Same constant folding as sample/decode.py::fold_layer.
            f = lp["fmha"]
            wc = f["qkv_conv"]["kernel"]
            bc = f["qkv_conv"]["bias"]
            folded_k, folded_b = [], []
            for part, nm in enumerate(("q_proj", "k_proj", "v_proj")):
                wp = f[nm]["kernel"].reshape(attn_w, heads * hd)
                bp = f[nm]["bias"].reshape(heads * hd)
                sl = slice(part * attn_w, (part + 1) * attn_w)
                folded_k.append(wc[:, :, sl] @ wp)
                folded_b.append(bc[sl] @ wp + bp)
            wo = f["o_proj"]["kernel"].reshape(heads * hd, attn_w)
            wp2, bp2 = f["proj"]["kernel"], f["proj"]["bias"]
            return {
                # (3, width, 3, heads, hd): tap, in, {q,k,v}, head-shardable
                "qkv_kernel": jnp.stack(
                    [k.reshape(3, width, heads, hd) for k in folded_k],
                    axis=2),
                "qkv_bias": jnp.stack(
                    [b.reshape(heads, hd) for b in folded_b], axis=0),
                # (heads, hd, width): head-row-shardable out projection
                "out_kernel": (wo @ wp2).reshape(heads, hd, width),
                "out_bias": f["o_proj"]["bias"] @ wp2 + bp2,
                "ln1": lp["ln1"], "ln2": lp["ln2"], "mlp": lp["mlp"],
            }

        layers = [fold_layer(p["transformer"][f"layer_{i}"])
                  for i in range(depth)]
        out_k, out_b = p["out"]["kernel"], p["out"]["bias"]
        # Stack per-layer trees so shard_map sees ONE pytree of arrays.
        stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)

        have_xc = x_cond_stream is not None
        have_y = y_cond is not None
        xc_arg = (x_cond_stream if have_xc
                  else jnp.zeros((1, 1, width), jnp.float32))
        y_arg = y_cond if have_y else jnp.zeros((1, 1, width), jnp.float32)

        def body(stacked, emb, pos, out_k, out_b, xc_arg, y_arg, rng):
            di = jax.lax.axis_index(axis)
            x_cond_stream = xc_arg if have_xc else None
            y_cond = y_arg if have_y else None

            # Slice this device's heads out of the replicated stacks.
            qkv_ks = jax.lax.dynamic_slice_in_dim(
                stacked["qkv_kernel"], di * h_loc, h_loc, axis=4)
            qkv_bs = jax.lax.dynamic_slice_in_dim(
                stacked["qkv_bias"], di * h_loc, h_loc, axis=2)
            out_ks = jax.lax.dynamic_slice_in_dim(
                stacked["out_kernel"], di * h_loc, h_loc, axis=1)

            k_cache0 = tuple(
                jnp.zeros((n_samples, ctx_len, h_loc, hd), xla_cdt)
                for _ in range(depth))
            v_cache0 = tuple(
                jnp.zeros((n_samples, ctx_len, h_loc, hd), xla_cdt)
                for _ in range(depth))
            u_cache0 = tuple(jnp.zeros((n_samples, 2, width), jnp.float32)
                             for _ in range(depth))

            def _layernorm(x, scale, bias, eps=1e-6):
                mu = jnp.mean(x, axis=-1, keepdims=True)
                var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
                return (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias

            def _attend(q, k, v, mask=None):
                logits = jnp.einsum(
                    "nhd,nlhd->nhl", q, k,
                    preferred_element_type=jnp.float32) / math.sqrt(hd)
                if mask is not None:
                    logits = jnp.where(mask[None, None, :], logits,
                                       jnp.float32(-1e9))
                w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
                return jnp.einsum("nhl,nlhd->nhd", w.astype(v.dtype), v)

            def layer_step(li, x, t, b, i, kc, vc, uc):
                lp = jax.tree_util.tree_map(lambda a: a[li], stacked)
                u = _layernorm(x, lp["ln1"]["scale"], lp["ln1"]["bias"])
                wk = qkv_ks[li]                 # (3, width, 3, h_loc, hd)
                bk = qkv_bs[li]                 # (3, h_loc, hd)
                qkv = (jnp.einsum("nw,wphd->nphd", uc[:, 0], wk[0])
                       + jnp.einsum("nw,wphd->nphd", uc[:, 1], wk[1])
                       + jnp.einsum("nw,wphd->nphd", u, wk[2]) + bk)
                uc = jnp.stack([uc[:, 1], u], axis=1)
                q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]  # (N, h_loc, hd)

                kc = jax.lax.dynamic_update_slice(
                    kc, k.astype(kc.dtype)[:, None], (0, t, 0, 0))
                vc = jax.lax.dynamic_update_slice(
                    vc, v.astype(vc.dtype)[:, None], (0, t, 0, 0))

                pattern = cfg.attn_pattern(li)
                if pattern == 0:
                    ks = jax.lax.dynamic_slice_in_dim(
                        kc, b * block_len, block_len, axis=1)
                    vs = jax.lax.dynamic_slice_in_dim(
                        vc, b * block_len, block_len, axis=1)
                    attn = _attend(q, ks, vs, jnp.arange(block_len) <= i)
                elif pattern == 1:
                    kg = kc.reshape(n_samples, blocks, block_len, h_loc, hd)
                    vg = vc.reshape(n_samples, blocks, block_len, h_loc, hd)
                    ks = jax.lax.dynamic_slice_in_dim(kg, i, 1, axis=2)[:, :, 0]
                    vs = jax.lax.dynamic_slice_in_dim(vg, i, 1, axis=2)[:, :, 0]
                    attn = _attend(q, ks, vs, jnp.arange(blocks) <= b)
                else:
                    start = jnp.maximum(b - 1, 0) * block_len
                    ks = jax.lax.dynamic_slice_in_dim(kc, start, block_len,
                                                      axis=1)
                    vs = jax.lax.dynamic_slice_in_dim(vc, start, block_len,
                                                      axis=1)
                    attn = _attend(q, ks, vs, None)
                    attn = attn * (b > 0).astype(attn.dtype)

                # Row-parallel out projection: this device's heads' rows,
                # partial (N, width) summed over the mesh — the layer's one
                # collective.
                res1_part = jnp.einsum("nhd,hdw->nw", attn, out_ks[li])
                res1 = jax.lax.psum(res1_part, axis) + lp["out_bias"]
                h = _layernorm(x + res1, lp["ln2"]["scale"],
                               lp["ln2"]["bias"])
                res2 = h @ lp["mlp"]["kernel"] + lp["mlp"]["bias"]
                return res2 + res1 + x, kc, vc, uc

            def scan_step(carry, t):
                token, k_cache, v_cache, u_cache, step_rng = carry
                k_cache, v_cache, u_cache = (list(k_cache), list(v_cache),
                                             list(u_cache))
                b = t // block_len
                i = t % block_len
                x = jnp.take(emb, token, axis=0)
                if y_cond is not None:
                    x = jnp.where(t == 0, y_cond[:, 0].astype(x.dtype), x)
                x = x * sqrt_d
                x = x + jax.lax.dynamic_slice_in_dim(pos, t, 1, axis=0)[0]
                if x_cond_stream is not None:
                    x = x + jax.lax.dynamic_slice_in_dim(
                        x_cond_stream, t, 1, axis=1)[:, 0]
                for li in range(depth):
                    x, k_cache[li], v_cache[li], u_cache[li] = layer_step(
                        li, x, t, b, i, k_cache[li], v_cache[li],
                        u_cache[li])
                logits = x @ out_k + out_b
                step_rng, sub = jax.random.split(step_rng)
                # Same stream on every device -> identical sampled token.
                next_token = sample_token(sub, logits, mode, temperature)
                out = (next_token, logits) if return_logits else next_token
                return (next_token, tuple(k_cache), tuple(v_cache),
                        tuple(u_cache), step_rng), out

            token0 = jnp.full((n_samples,), start_token, jnp.int32)
            _, outs = jax.lax.scan(
                scan_step, (token0, k_cache0, v_cache0, u_cache0, rng),
                jnp.arange(ctx_len))
            if return_logits:
                sampled, logits = outs
                return (jnp.concatenate([token0[:, None], sampled.T], axis=1),
                        jnp.transpose(logits, (1, 0, 2)))
            return jnp.concatenate([token0[:, None], outs.T], axis=1)

        n_in = (P(),) * 8
        n_out = (P(), P()) if return_logits else P()
        fn = shard_map(body, mesh=mesh, in_specs=n_in, out_specs=n_out,
                       **{_REP_KWARG: False})
        return fn(stacked, emb, pos, out_k, out_b, xc_arg, y_arg, rng)

    return jax.jit(decode, static_argnames=())
