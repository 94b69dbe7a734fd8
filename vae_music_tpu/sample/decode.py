"""KV-cached autoregressive token decode — the headline TPU rewrite.

The reference samples by re-running the ENTIRE transformer on the whole
prefix for every token (O(T^2 * depth) total work, no KV cache — the TODO at
/root/reference/src/autoregressive/autoregressive_fmha.py:199-203).  Here the
decode is a single jitted ``lax.scan`` over positions with per-pattern
HBM-resident KV caches, O(T * (block_len + blocks) * depth):

  position t, block b = t // block_len, offset i = t % block_len
  * row      : attends cache[b*l : b*l+l] masked to offsets <= i
  * col      : attends column i of every block 0..b (strided cache view)
  * prev_row : attends cache[(b-1)*l : b*l], zero output for b == 0

The causal QKV Conv1D(k=3) needs only the last two layer inputs, kept in a
tiny rolling cache.  Everything is static-shaped; one compile per
(ctx_len, batch) pair.

Correctness contract (the reference's key invariant,
factorized_attention.py:446-462): each decode step's hidden state/logits must
equal the full-sequence forward at that position — enforced by
tests/test_decode.py.

Sampling mode default is Gumbel-max categorical, mathematically identical to
the reference's ``RelaxedOneHotCategorical(temp=1).sample() -> argmax``
(autoregressive_fmha.py:217-221); greedy / temperature / top-k / top-p
(nucleus, beyond-reference) also provided.
"""

from __future__ import annotations

import enum
import math
from typing import Optional

import jax
import jax.numpy as jnp

from vae_music_tpu.configs import PriorConfig


class SampleMode(enum.Enum):
    GUMBEL = "gumbel"      # categorical via Gumbel-max (reference default)
    GREEDY = "greedy"
    TOP_K = "top_k"
    TOP_P = "top_p"        # nucleus sampling (beyond-reference)


def _layernorm(x, scale, bias, eps=1e-6):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(x.dtype)


def _attend_single(q, k, v, mask=None):
    """q: (N,H,hd); k,v: (N,L,H,hd); mask: (L,) or (N? no) keep-mask.

    Returns (N,H,hd).  Matches masked_mha numerics (f32 softmax, -1e9 mask).
    """
    hd = q.shape[-1]
    logits = jnp.einsum("nhd,nlhd->nhl", q, k,
                        preferred_element_type=jnp.float32) / math.sqrt(hd)
    if mask is not None:
        logits = jnp.where(mask[None, None, :], logits, jnp.float32(-1e9))
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.einsum("nhl,nlhd->nhd", w.astype(v.dtype), v)


def sample_token(rng: jax.Array, logits: jnp.ndarray, mode: SampleMode,
                 temperature: float = 1.0, top_k: int = 0,
                 top_p: float = 1.0) -> jnp.ndarray:
    """(N, bins) logits -> (N,) int32 tokens."""
    if mode == SampleMode.GREEDY:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits / jnp.float32(max(temperature, 1e-6))
    if mode == SampleMode.TOP_K and top_k > 0:
        kth = jnp.sort(logits, axis=-1)[:, -top_k][:, None]
        logits = jnp.where(logits < kth, -1e9, logits)
    if mode == SampleMode.TOP_P and top_p < 1.0:
        # Nucleus: keep the smallest prefix of descending-prob tokens whose
        # cumulative mass reaches top_p (the threshold token included).  The
        # floor keeps the top token selectable even at top_p <= 0 (which
        # would otherwise mask EVERY bin and degenerate to token 0).
        top_p = max(float(top_p), 1e-9)
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        keep = jnp.cumsum(probs, axis=-1) - probs < top_p   # (N, bins)
        cutoff = jnp.min(jnp.where(keep, sorted_logits, jnp.inf),
                         axis=-1, keepdims=True)
        logits = jnp.where(logits < cutoff, -1e9, logits)
    return jax.random.categorical(rng, logits, axis=-1).astype(jnp.int32)


def make_decode_fn(
    cfg: PriorConfig,
    ctx_len: int,
    n_samples: int,
    *,
    mode: SampleMode = SampleMode.GUMBEL,
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 1.0,
    return_logits: bool = False,
    unroll: int = 1,
    fused: Optional[bool] = None,
    fused_interpret=False,      # False | True | "tpu" (TPU interpreter)
    prime_len: int = 0,
    cache_dtype: str = "float32",
    sample_in_kernel: Optional[bool] = None,
    hist_slots: int = 0,        # 0 = kernel default; perf-lab knob
    weight_dtype: str = "float32",  # XLA/grid paths: weight storage dtype
    grid_chunk: int = 0,        # fused="grid": history chunk rows (0 = auto)
    grid_hist_bf16: bool = False,  # fused="grid": bf16 history math (perf lab)
):
    """Build a jitted sampler for one prior level.

    Returned fn signature:
        decode(params, rng, x_cond_stream=None, y_cond=None[, prime])
            -> tokens (N, ctx_len+1)
    where ``x_cond_stream`` is the ALREADY-UPSAMPLED conditioning stream
    (N, ctx_len, width) (autoregressive_fmha.py:180-189 upsamples once before
    the token loop) and ``y_cond`` is the (N, 1, width) label embedding.
    Output includes the leading start token (strip with [:, 1:], Sampler.py:105).

    ``prime_len > 0`` enables primed/continuation decoding (the reference
    stubs this out, Sampler.py:111-119): ``prime`` (N, prime_len) int codes
    are teacher-forced as positions 1..prime_len and sampling continues from
    there; the returned tokens echo the prime in those positions.
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
    if fused is None:
        from vae_music_tpu.ops.decode_pallas import decode_pallas_available

        fused = decode_pallas_available(n_samples, heads)
    # fused="grid": the layer-grid kernel (ops/decode_grid_pallas.py) —
    # compile size O(1) in depth, weights streamed per layer, online-softmax
    # chunked history.  The dispatch choice for geometries where the
    # unrolled kernel hits its Mosaic compile wall (depth x width large).
    grid = fused == "grid"
    patterns = tuple(cfg.attn_pattern(li) for li in range(depth))
    if sample_in_kernel is None:
        # Auto: the fully-fused step (head + sampling + next-embed inside the
        # kernel) covers ALL serving sampling modes — gumbel/greedy, top-k
        # (r3: exact in-kernel k-th-largest threshold by int-bisection, see
        # ops/decode_pallas.kth_largest_threshold), and top-p (r3: nucleus
        # cutoff by probability-mass bisection, top_p_cutoff_threshold);
        # only priming and logits capture fall back to per-step XLA sampling.
        ok_mode = ((mode in (SampleMode.GUMBEL, SampleMode.GREEDY)
                    and top_k == 0)
                   or (mode == SampleMode.TOP_K and top_k > 0)
                   or (mode == SampleMode.TOP_P and top_p < 1.0))
        # Mosaic requires the stream DMA's lane (width) dim 128-aligned on
        # real TPUs; narrower models keep the fused layers but sample in XLA
        # (interpret mode has no alignment constraint).
        width_ok = bool(fused_interpret) or width % 128 == 0
        sample_in_kernel = (bool(fused) and not grid and prime_len == 0
                            and not return_logits and ok_mode and width_ok)
    assert not (sample_in_kernel and not fused)
    assert not (sample_in_kernel and grid), (
        "sample_in_kernel needs the depth-UNROLLED kernel; fused='grid' keeps "
        "the logits head / sampling outside the kernel by design (and the "
        "unrolled fallback would re-hit the Mosaic compile wall the grid "
        "kernel exists to avoid) — pass sample_in_kernel=None with 'grid'")
    assert not (sample_in_kernel and (prime_len > 0 or return_logits)), (
        "sample_in_kernel supports the unprimed, no-logits fast paths only")
    bins_p = -(-cfg.bins // 128) * 128  # head/emb padded to the lane size
    # "int4": packed-nibble caches (two int4 per int8 byte along hd) — the
    # grid kernel's capacity mode; storage arrays are int8 with hd halved.
    quant4 = str(cache_dtype) == "int4"
    if quant4:
        cache_dtype = "int8"
    quant = jnp.dtype(cache_dtype) == jnp.dtype(jnp.int8)
    assert not (quant and not fused), "int8 KV caches are fused-kernel-only"
    assert not (quant4 and not grid), "int4 KV caches are grid-kernel-only"
    assert not (quant4 and hd % 2), "int4 packing needs an even head dim"
    assert not (jnp.dtype(weight_dtype) == jnp.dtype(jnp.int8)
                and not grid), "int8 streamed weights are grid-kernel-only"
    hd_store = hd // 2 if quant4 else hd

    def decode(params, rng, x_cond_stream=None, y_cond=None, prime=None):
        assert (prime is not None) == (prime_len > 0)

        def apply_prime(next_token, t):
            if prime_len == 0:
                return next_token
            pt = jax.lax.dynamic_slice_in_dim(
                prime, jnp.minimum(t, prime_len - 1), 1, axis=1)[:, 0]
            return jnp.where(t < prime_len, pt.astype(jnp.int32), next_token)

        p = params["params"]
        emb = p["x_embedding"]["embedding"]            # (bins, width)
        if cfg.pos_emb:
            pos = p["x_pos_embedding"]["embeddings"]   # (>=ctx_len, width)
        else:
            from vae_music_tpu.nn.positional import sinusoidal_encoding

            pos = sinusoidal_encoding(ctx_len, width)[0]
        # Fold the per-head q/k/v projections into the causal-conv kernel and
        # the o_proj into the final proj — constant folding done once per
        # call, removing 4 of the 6 matmuls from every decode step.
        def fold_layer(lp):
            f = lp["fmha"]
            wc = f["qkv_conv"]["kernel"]            # (3, d_model, 3*attn_w)
            bc = f["qkv_conv"]["bias"]              # (3*attn_w,)
            folded_k, folded_b = [], []
            for part, nm in enumerate(("q_proj", "k_proj", "v_proj")):
                wp = f[nm]["kernel"].reshape(attn_w, heads * hd)
                bp = f[nm]["bias"].reshape(heads * hd)
                sl = slice(part * attn_w, (part + 1) * attn_w)
                folded_k.append(wc[:, :, sl] @ wp)              # (3, d_model, h*hd)
                folded_b.append(bc[sl] @ wp + bp)
            wo = f["o_proj"]["kernel"].reshape(heads * hd, attn_w)
            bo = f["o_proj"]["bias"]
            wp2, bp2 = f["proj"]["kernel"], f["proj"]["bias"]
            return {
                "qkv_kernel": jnp.concatenate(folded_k, axis=-1),  # (3, d, 3*h*hd)
                "qkv_bias": jnp.concatenate(folded_b, axis=-1),
                "out_kernel": wo @ wp2,                            # (h*hd, d_model)
                "out_bias": bo @ wp2 + bp2,
                "ln1": lp["ln1"], "ln2": lp["ln2"], "mlp": lp["mlp"],
            }

        layers = [fold_layer(p["transformer"][f"layer_{i}"])
                  for i in range(depth)]
        out_k, out_b = p["out"]["kernel"], p["out"]["bias"]

        # XLA-path weight streaming dtype.  The scan body re-reads every
        # folded weight matrix from HBM each token step (~807 MB/step in f32
        # at the JUKEBOX_SMALL_PRIOR geometry); bf16 storage halves that
        # traffic while matmuls keep f32 accumulation (jnp promotes
        # f32 @ bf16), biases and layernorm params stay f32.  MEASURED at
        # that geometry (batch 32, 2026-08-19): 5477.8 vs 5480.6 us/step —
        # NO speedup; the wide XLA step is serialization-bound (48 strictly
        # sequential layers of small ops), not weight-bandwidth-bound, which
        # also shows in batch 16 -> 32 almost doubling throughput for +10%
        # step time.  Kept as a capacity/fidelity-neutral option; the real
        # wide-serving fix is the layer-grid fused kernel.  Fused-path
        # weights are VMEM-staged per kernel launch and keep f32.
        wdt = jnp.dtype(weight_dtype)
        if not fused and wdt != jnp.float32:
            def _cast_mats(lp):
                lp = dict(lp)
                lp["qkv_kernel"] = lp["qkv_kernel"].astype(wdt)
                lp["out_kernel"] = lp["out_kernel"].astype(wdt)
                lp["mlp"] = {"kernel": lp["mlp"]["kernel"].astype(wdt),
                             "bias": lp["mlp"]["bias"]}
                return lp

            layers = [_cast_mats(lp) for lp in layers]
            out_k = out_k.astype(wdt)

        # Per-layer cache arrays (a tuple, not one stacked array): each layer's
        # dynamic_update_slice then touches only its own buffer, which XLA
        # updates in place inside the scan carry.  Float cache_dtype is
        # honored here too (attention math stays f32 via _attend_single's
        # preferred_element_type/softmax); int8 is rejected above — the
        # factored-scale bookkeeping lives in the fused kernel.  At the
        # JUKEBOX_SMALL_PRIOR geometry bf16 is the difference between fitting
        # on one chip and a 48 GB HBM OOM (96 caches of (N, 8192, 2, 128)).
        xla_cdt = jnp.dtype(cache_dtype)
        k_cache0 = tuple(jnp.zeros((n_samples, ctx_len, heads, hd), xla_cdt)
                         for _ in range(depth))
        v_cache0 = tuple(jnp.zeros((n_samples, ctx_len, heads, hd), xla_cdt)
                         for _ in range(depth))
        u_cache0 = tuple(jnp.zeros((n_samples, 2, width), jnp.float32)
                         for _ in range(depth))

        def layer_step(li, lp, x, t, b, i, kc, vc, uc):
            """One residual attn block at position t. x: (N, width).

            kc/vc/uc are THIS layer's caches; returns their updated values.
            """
            u = _layernorm(x, lp["ln1"]["scale"], lp["ln1"]["bias"])
            # Folded causal conv k=3 (+ per-head projections) from the
            # rolling u-cache (zeros before t=0).
            w_conv = lp["qkv_kernel"]                  # (3, width, 3*h*hd)
            qkv = (uc[:, 0] @ w_conv[0]
                   + uc[:, 1] @ w_conv[1]
                   + u @ w_conv[2] + lp["qkv_bias"])
            uc = jnp.stack([uc[:, 1], u], axis=1)
            q, k, v = jnp.split(qkv, 3, axis=-1)       # (N, h*hd) each
            q = q.reshape(n_samples, heads, hd)
            k = k.reshape(n_samples, heads, hd)
            v = v.reshape(n_samples, heads, hd)

            kc = jax.lax.dynamic_update_slice(
                kc, k.astype(kc.dtype)[:, None], (0, t, 0, 0))
            vc = jax.lax.dynamic_update_slice(
                vc, v.astype(vc.dtype)[:, None], (0, t, 0, 0))

            pattern = cfg.attn_pattern(li)
            if pattern == 0:  # row: current block, offsets <= i
                ks = jax.lax.dynamic_slice_in_dim(kc, b * block_len, block_len, axis=1)
                vs = jax.lax.dynamic_slice_in_dim(vc, b * block_len, block_len, axis=1)
                mask = jnp.arange(block_len) <= i
                attn = _attend_single(q, ks, vs, mask)
            elif pattern == 1:  # col: offset i of blocks <= b
                kg = kc.reshape(n_samples, blocks, block_len, heads, hd)
                vg = vc.reshape(n_samples, blocks, block_len, heads, hd)
                ks = jax.lax.dynamic_slice_in_dim(kg, i, 1, axis=2)[:, :, 0]
                vs = jax.lax.dynamic_slice_in_dim(vg, i, 1, axis=2)[:, :, 0]
                mask = jnp.arange(blocks) <= b
                attn = _attend_single(q, ks, vs, mask)
            else:  # prev_row: whole previous block (zero output at b == 0)
                start = jnp.maximum(b - 1, 0) * block_len
                ks = jax.lax.dynamic_slice_in_dim(kc, start, block_len, axis=1)
                vs = jax.lax.dynamic_slice_in_dim(vc, start, block_len, axis=1)
                attn = _attend_single(q, ks, vs, None)
                attn = attn * (b > 0).astype(attn.dtype)

            res1 = (attn.reshape(n_samples, heads * hd) @ lp["out_kernel"]
                    + lp["out_bias"])
            h = _layernorm(x + res1, lp["ln2"]["scale"], lp["ln2"]["bias"])
            res2 = h @ lp["mlp"]["kernel"] + lp["mlp"]["bias"]
            return res2 + res1 + x, kc, vc, uc

        def scan_step(carry, t):
            token, k_cache, v_cache, u_cache, step_rng = carry
            k_cache, v_cache, u_cache = (list(k_cache), list(v_cache),
                                         list(u_cache))
            b = t // block_len
            i = t % block_len
            x = jnp.take(emb, token, axis=0)           # (N, width)
            if y_cond is not None:
                x = jnp.where(t == 0, y_cond[:, 0].astype(x.dtype), x)
            x = x * sqrt_d
            x = x + jax.lax.dynamic_slice_in_dim(pos, t, 1, axis=0)[0]
            if x_cond_stream is not None:
                x = x + jax.lax.dynamic_slice_in_dim(x_cond_stream, t, 1, axis=1)[:, 0]
            for li, lp in enumerate(layers):
                x, k_cache[li], v_cache[li], u_cache[li] = layer_step(
                    li, lp, x, t, b, i, k_cache[li], v_cache[li], u_cache[li])
            logits = x @ out_k + out_b                 # (N, bins)
            step_rng, sub = jax.random.split(step_rng)
            next_token = apply_prime(
                sample_token(sub, logits, mode, temperature, top_k,
                             top_p), t)
            out = (next_token, logits) if return_logits else next_token
            return (next_token, tuple(k_cache), tuple(v_cache),
                    tuple(u_cache), step_rng), out

        # --- layer-grid kernel path: one grid step per layer ---------------
        def grid_scan_step(carry, t):
            token, uc, kc, vc, scales, step_rng = carry
            x = jnp.take(emb, token, axis=0)
            if y_cond is not None:
                x = jnp.where(t == 0, y_cond[:, 0].astype(x.dtype), x)
            x = x * sqrt_d
            x = x + jax.lax.dynamic_slice_in_dim(pos, t, 1, axis=0)[0]
            if x_cond_stream is not None:
                x = x + jax.lax.dynamic_slice_in_dim(
                    x_cond_stream, t, 1, axis=1)[:, 0]
            scalars = jnp.reshape(t, (1, 1)).astype(jnp.int32)
            from vae_music_tpu.ops.decode_grid_pallas import grid_decode_step

            outs = grid_decode_step(
                scalars, pattern_arr, x.astype(jnp.float32), uc, kc, vc,
                fused_weights,
                kscale=scales[0] if quant else None,
                vscale=scales[1] if quant else None,
                wscales=grid_wscales,
                depth=depth, n=n_samples, heads=heads, hd=hd, width=width,
                blocks=blocks, block_len=block_len, chunk=grid_chunk,
                hist_bf16=grid_hist_bf16,
                hist_slots=(hist_slots or 2),
                packed_int4=quant4,
                interpret=fused_interpret)
            x, uc, kc, vc = outs[:4]
            scales = tuple(outs[4:])
            logits = x @ out_k + out_b
            step_rng, sub = jax.random.split(step_rng)
            next_token = apply_prime(
                sample_token(sub, logits, mode, temperature, top_k,
                             top_p), t)
            out = (next_token, logits) if return_logits else next_token
            return (next_token, uc, kc, vc, scales, step_rng), out

        # --- fused-kernel path: all layers of a step in one Pallas call ----
        def fused_scan_step(carry, t):
            token, uc, kc, vc, scales, step_rng = carry
            x = jnp.take(emb, token, axis=0)
            if y_cond is not None:
                x = jnp.where(t == 0, y_cond[:, 0].astype(x.dtype), x)
            x = x * sqrt_d
            x = x + jax.lax.dynamic_slice_in_dim(pos, t, 1, axis=0)[0]
            if x_cond_stream is not None:
                x = x + jax.lax.dynamic_slice_in_dim(x_cond_stream, t, 1, axis=1)[:, 0]
            scalars = jnp.reshape(t, (1, 1)).astype(jnp.int32)
            from vae_music_tpu.ops.decode_pallas import fused_decode_step

            outs = fused_decode_step(
                scalars, x.astype(jnp.float32), uc, kc, vc, fused_weights,
                kscale=scales[0] if quant else None,
                vscale=scales[1] if quant else None,
                depth=depth, n=n_samples, heads=heads, hd=hd, width=width,
                blocks=blocks, block_len=block_len, patterns=patterns,
                hist_slots=hslots, interpret=fused_interpret)
            x, uc, kc, vc = outs[:4]
            scales = tuple(outs[4:])
            logits = x @ out_k + out_b
            step_rng, sub = jax.random.split(step_rng)
            next_token = apply_prime(
                sample_token(sub, logits, mode, temperature, top_k,
                             top_p), t)
            out = (next_token, logits) if return_logits else next_token
            return (next_token, uc, kc, vc, scales, step_rng), out

        token0 = jnp.full((n_samples,), start_token, jnp.int32)
        if fused:
            # Folded per-layer weights stacked for the kernel, and the
            # lane-major HBM caches (bf16 caches halve the per-step DMA —
            # opt-in, serving); shared by both fused scan bodies.
            nh = n_samples * heads
            fused_weights = (
                jnp.stack([lp["qkv_kernel"] for lp in layers]),
                jnp.stack([lp["qkv_bias"] for lp in layers]),
                jnp.stack([lp["out_kernel"] for lp in layers]),
                jnp.stack([lp["out_bias"] for lp in layers]),
                jnp.stack([lp["ln1"]["scale"] for lp in layers]),
                jnp.stack([lp["ln1"]["bias"] for lp in layers]),
                jnp.stack([lp["ln2"]["scale"] for lp in layers]),
                jnp.stack([lp["ln2"]["bias"] for lp in layers]),
                jnp.stack([lp["mlp"]["kernel"] for lp in layers]),
                jnp.stack([lp["mlp"]["bias"] for lp in layers]),
            )
            grid_wscales = None
            if grid:
                pattern_arr = jnp.asarray([patterns], jnp.int32)
                if wdt == jnp.int8:
                    # int8-streamed weights: per-layer, per-output-column
                    # symmetric quantization (ops/decode_grid_pallas.py::
                    # quantize_weight_cols); halves the per-step weight DMA
                    # again vs bf16, the kernel dequantizes with a bare
                    # int8->bf16 convert and scales the matmul results.
                    from vae_music_tpu.ops.decode_grid_pallas import (
                        quantize_weight_cols)

                    fw = list(fused_weights)
                    qs = []
                    for idx in (0, 2, 8):       # qkv_k, out_k, mlp_k
                        q, s = jax.vmap(quantize_weight_cols)(fw[idx])
                        fw[idx] = q
                        qs.append(s.reshape(s.shape[0], s.shape[-1]))
                    fused_weights = tuple(fw)
                    grid_wscales = tuple(qs)
                elif wdt != jnp.float32:
                    # Grid path streams the big matrices per layer from HBM
                    # every step — bf16 storage halves that traffic and runs
                    # the MXU in its native mixed-precision mode (f32 accum).
                    fw = list(fused_weights)
                    for idx in (0, 2, 8):       # qkv_k, out_k, mlp_k
                        fw[idx] = fw[idx].astype(wdt)
                    fused_weights = tuple(fw)
            uc0 = jnp.zeros((depth, n_samples, 2, width), jnp.float32)
            # Tile-major KV caches: each (layer, lane-tile) slab contiguous
            # in HBM (full-burst history DMAs at any batch/tiling).
            from vae_music_tpu.ops.decode_pallas import (
                HIST_SLOTS, decode_cache_lane_tiles, decode_cache_shape)

            hslots = hist_slots or HIST_SLOTS
            lt = decode_cache_lane_tiles(nh, block_len, hd_store,
                                         jnp.dtype(cache_dtype), blocks,
                                         hslots)
            kc0 = jnp.zeros(
                decode_cache_shape(depth, blocks, block_len, hd_store, nh,
                                   lt),
                jnp.dtype(cache_dtype))
            vc0 = jnp.zeros_like(kc0)
            if quant:
                # int8 caches carry per-(position, lane) scale side caches
                # (SCALE_DTYPE=f32, hd/4-fold smaller than the values at
                # hd=16) through the scan.
                from vae_music_tpu.ops.decode_pallas import (
                    SCALE_DTYPE, decode_scale_cache_shape)

                sshape = decode_scale_cache_shape(depth, blocks, block_len,
                                                  nh, lt)
                scales0 = (jnp.zeros(sshape, SCALE_DTYPE),
                           jnp.zeros(sshape, SCALE_DTYPE))
            else:
                scales0 = ()
        if fused and sample_in_kernel:
            from vae_music_tpu.ops.decode_pallas import fused_decode_step_sample

            inv_temp = jnp.float32(1.0 / max(temperature, 1e-6))
            head_k = (out_k * inv_temp).astype(jnp.float32)      # (width, bins)
            head_k = jnp.pad(head_k, ((0, 0), (0, bins_p - cfg.bins)))
            head_b = jnp.pad((out_b * inv_temp).astype(jnp.float32)[None],
                             ((0, 0), (0, bins_p - cfg.bins)),
                             constant_values=-1e9)               # (1, bins_p)
            emb_p = jnp.pad((emb * sqrt_d).astype(jnp.float32),
                            ((0, bins_p - cfg.bins), (0, 0)))    # (bins_p, width)
            # pos (+ per-sample x_cond) for positions 1..ctx-1, padded one row
            # so the kernel's t+1 read stays in range at the last step.
            pos_rows = jnp.concatenate(
                [pos[:ctx_len].astype(jnp.float32),
                 jnp.zeros((1, width), jnp.float32)], axis=0)    # (ctx+1, w)
            if x_cond_stream is not None:
                xc = jnp.transpose(x_cond_stream, (1, 0, 2)).astype(jnp.float32)
                xc = jnp.concatenate(
                    [xc, jnp.zeros((1, n_samples, width), jnp.float32)], axis=0)
                stream = pos_rows[:, None, :] + xc               # (ctx+1, N, w)
            else:
                stream = pos_rows[:, None, :]                    # (ctx+1, 1, w)

            # Position 0's input, exactly as the reference seeds it: start
            # token embedding (or y_cond), *sqrt(d), + pos[0] (+ x_cond[0]).
            x0 = emb[start_token][None] * sqrt_d
            if y_cond is not None:
                x0 = y_cond[:, 0].astype(jnp.float32) * sqrt_d
            x0 = jnp.broadcast_to(x0, (n_samples, width)) + pos[0]
            if x_cond_stream is not None:
                x0 = x0 + x_cond_stream[:, 0]
            # Two int32 seeds for the kernel's hardware PRNG (works for both
            # typed and raw uint32 PRNG keys).
            seeds = jax.lax.bitcast_convert_type(
                jax.random.bits(rng, (2,), jnp.uint32), jnp.int32)

            seeds2d = seeds[None, :]                         # (1, 2), invariant

            def sample_scan_step(carry, t):
                x, uc, kc, vc, scales = carry
                # The whole per-step XLA body is this reshape: block/offset
                # arithmetic moved onto the kernel's scalar unit.
                scalars = jnp.reshape(t, (1, 1)).astype(jnp.int32)
                outs = fused_decode_step_sample(
                    scalars, seeds2d, x, uc, kc, vc, fused_weights,
                    head_k, head_b, emb_p, stream,
                    kscale=scales[0] if quant else None,
                    vscale=scales[1] if quant else None,
                    depth=depth, n=n_samples, heads=heads, hd=hd, width=width,
                    blocks=blocks, block_len=block_len, patterns=patterns,
                    mode=mode.value, top_k=top_k, top_p=top_p,
                    hist_slots=hslots, interpret=fused_interpret)
                x, tok, uc, kc, vc = outs[:5]
                return (x, uc, kc, vc, tuple(outs[5:])), tok[0]

            # unroll MUST stay 1 here: an unrolled body defeats the
            # kernel's in-place cache aliasing, inserting full KV-cache
            # copies between the per-iteration kernel calls (measured
            # 55 -> 292 us/step at unroll=2).
            _, sampled = jax.lax.scan(sample_scan_step,
                                      (x0, uc0, kc0, vc0, scales0),
                                      jnp.arange(ctx_len))       # (ctx, N)
            return jnp.concatenate([token0[:, None], sampled.T], axis=1)
        if fused:
            carry0 = (token0, uc0, kc0, vc0, scales0, rng)
            _, outs = jax.lax.scan(
                grid_scan_step if grid else fused_scan_step, carry0,
                jnp.arange(ctx_len))
        else:
            carry0 = (token0, k_cache0, v_cache0, u_cache0, rng)
            # unroll=1 measured fastest on TPU v5e (higher unroll inflates the
            # loop body past what the scheduler overlaps; scan overhead ~1us).
            _, outs = jax.lax.scan(scan_step, carry0, jnp.arange(ctx_len),
                                   unroll=min(unroll, ctx_len))
        if return_logits:
            sampled, logits = outs
            tokens = jnp.concatenate([token0[:, None], sampled.T], axis=1)
            return tokens, jnp.transpose(logits, (1, 0, 2))
        tokens = jnp.concatenate([token0[:, None], outs.T], axis=1)
        return tokens

    return jax.jit(decode)
