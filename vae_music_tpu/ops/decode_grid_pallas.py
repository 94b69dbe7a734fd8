"""Layer-grid fused decode-step kernel (Pallas/TPU) — depth-scalable variant.

The depth-unrolled kernel in ``decode_pallas.py`` emits every transformer
layer into one Mosaic program with all folded weights VMEM-resident.  That is
the right call at the flagship geometry (width 128, depth 6: ~1.5 MB of
weights, seconds to compile, 41.9 us/step) and the wrong one at
JUKEBOX_SMALL_PRIOR scale (width 1024, depth 48, ctx 8192 —
/root/reference/SMALL_PRIOR_model_structuree:2): the Mosaic program is ~8x
larger (a cold compile exceeded 40 min on v5e without finishing) and the
folded f32 weights (~700 MB) could never be VMEM-resident anyway.

This kernel makes depth a GRID dimension instead: ``grid=(depth,)``, one grid
step per layer.  TPU grid steps execute sequentially on one core, so

  * program size and compile time are O(1) in depth — one layer body, all
    three attention patterns emitted once behind ``pl.when`` predicates on
    the layer's pattern id (read from an SMEM table, so the SAME program
    serves any row/col/prev_row schedule);
  * per-layer weights arrive via BlockSpec index_map — Mosaic's grid
    pipeline double-buffers the next layer's weight DMA behind the current
    layer's compute, which IS the weight-streaming schedule a
    hundreds-of-MB decode needs;
  * the residual stream x lives in VMEM scratch carried across grid steps
    (scratch persists across the grid on a core);
  * row/prev_row history attention is ONLINE-SOFTMAX CHUNKED
    (flash-decoding): the kernel never holds a whole (block_len, hd, nh_t)
    history slab in VMEM — 33.5 MB bf16 at the wide geometry — only
    double-buffered (chunk, hd, nh_t) pieces plus (1, nh_t) running
    max/sum and an (hd, nh_t) accumulator.  Row chunks entirely above the
    current offset are skipped (no DMA, no math), exactly like the
    unrolled kernel's predicated chunks.

Cache layout, int8 scale factoring, and the masked-race argument for
overlapping the current-position cache write with history reads are all
inherited unchanged from ``decode_pallas.py`` (same tile-major
``decode_cache_shape`` caches — the two kernels are drop-in siblings).

The logits head / sampling / next-token embedding stay OUTSIDE this kernel
(XLA around the scan body): at the geometries where the grid kernel is the
dispatch winner the step is >1 ms, so per-step XLA dispatch is noise, and
keeping the tail out keeps the grid program small.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from vae_music_tpu.ops.decode_pallas import (
    LANE,
    SCALE_DTYPE,
    _interp,
)

try:
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False


def grid_decode_chunk(block_len: int, hd: int, nh_t: int,
                      cache_bytes: int) -> int:
    """History chunk rows: the largest divisor of ``block_len`` keeping one
    double-buffered k+v chunk pair within ~8 MB of VMEM (the weight blocks
    need the rest of the budget)."""
    budget = 8 * 1024 * 1024
    best = None
    for c in range(1, block_len + 1):
        if block_len % c:
            continue
        if 2 * 2 * c * hd * nh_t * cache_bytes <= budget:
            best = c
    return best or 1


def grid_step_byte_account(depth, n, heads, hd, width, blocks, block_len,
                           chunk, cache_dtype, weight_dtype, patterns,
                           hbm_bw=819e9):
    """Position-averaged HBM bytes per decode step (the kernel's roofline).

    Counts exactly what the kernel moves: per-layer streamed weights, the
    chunk-granular row history (chunks with c*chunk < i), the full previous
    block for prev_row (skipped at b == 0), the col column slab, int8 scale
    side caches, the current position's cache writes, and the uc rolling
    cache.  Returns a dict with the per-step byte split and the implied
    HBM-bandwidth floor in microseconds at ``hbm_bw`` (v5e: 819 GB/s).
    """
    nh = n * heads
    cache_b = jnp.dtype(cache_dtype).itemsize
    w_b = jnp.dtype(weight_dtype).itemsize
    quant = jnp.dtype(cache_dtype) == jnp.dtype(jnp.int8)
    hh = heads * hd
    # Per-layer streamed weights: qkv (3, width, 3*hh), out (hh, width),
    # mlp (width, width) in weight_dtype; biases/LN params f32.
    mats = 3 * width * 3 * hh + hh * width + width * width
    vecs = (3 * hh + width + width) * 4 + 4 * width * 4
    weights = depth * (mats * w_b + vecs)
    # Row: chunk-granular average of ceil(i/chunk)*chunk rows over i.
    rows_row = sum(-(-i // chunk) * chunk
                   for i in range(block_len)) / block_len
    rows_prev = block_len * (blocks - 1) / blocks      # b == 0 skipped
    rows_col = blocks                                   # full column slab
    per_row = hd * nh * cache_b * 2                     # k + v values
    per_row_scale = (nh * jnp.dtype(SCALE_DTYPE).itemsize * 2
                     if quant else 0)
    n_pat = {p: sum(1 for q in patterns if q == p) for p in (0, 1, 2)}
    hist = {
        "row": n_pat[0] * rows_row * (per_row + per_row_scale),
        "prev_row": n_pat[2] * rows_prev * (per_row + per_row_scale),
        "col": n_pat[1] * rows_col * (per_row + per_row_scale),
    }
    writes = depth * (per_row + per_row_scale)          # current position
    uc = depth * n * 2 * width * 4 * 2                  # read + write
    x_io = 2 * n * width * 4
    total = weights + sum(hist.values()) + writes + uc + x_io
    return {
        "weights_mb": round(weights / 2**20, 1),
        "hist_row_mb": round(hist["row"] / 2**20, 1),
        "hist_prev_row_mb": round(hist["prev_row"] / 2**20, 1),
        "hist_col_mb": round(hist["col"] / 2**20, 1),
        "writes_uc_mb": round((writes + uc + x_io) / 2**20, 1),
        "total_mb": round(total / 2**20, 1),
        "floor_us": round(total / hbm_bw * 1e6, 1),
    }


def quantize_weight_cols(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric int8 quantization with one f32 scale per OUTPUT column.

    ``w`` is (..., rows, cols); all leading/contraction axes share the
    column's scale, so a sum of per-tap matmuls against the quantized taps
    needs only ONE trailing (1, cols) multiply — applied to the (n, cols)
    matmul RESULT, not the streamed weights, keeping the in-kernel dequant
    to a bare int8->bf16 convert.
    """
    amax = jnp.max(jnp.abs(w), axis=tuple(range(w.ndim - 1)), keepdims=True)
    scale = (amax / 127.0).astype(jnp.float32)
    inv = jnp.where(scale > 0, 1.0 / jnp.where(scale > 0, scale, 1.0), 0.0)
    q = jnp.clip(jnp.round(w * inv), -127.0, 127.0).astype(jnp.int8)
    return q, scale.reshape(1, w.shape[-1])


def _make_grid_kernel(depth, n, heads, hd, width, blocks, block_len, chunk,
                      cache_dtype, lane_tiles, w_quant=False,
                      hist_bf16=False, hist_slots=2, quant4=False):
    nh = n * heads
    nh_t = nh // lane_tiles
    hh = heads * hd
    inv_sqrt_hd = 1.0 / math.sqrt(hd)
    quant = jnp.dtype(cache_dtype) == jnp.dtype(jnp.int8)
    hd2 = hd // 2   # packed-int4 storage rows (two nibbles per int8 byte)
    n_parts = 4 if quant else 2
    n_chunks = block_len // chunk

    def kernel(*refs):
        neg = jnp.float32(-1e9)
        it = iter(refs)

        def nxt():
            return next(it)

        scalar_ref = nxt()                                  # SMEM (1, 1): t
        pat_ref = nxt()                                     # SMEM (1, depth)
        x_ref = nxt()                                       # VMEM (n, width)
        uc_ref = nxt()                                      # VMEM (1, n, 2, w)
        kc_ref, vc_ref = nxt(), nxt()                       # ANY (HBM)
        ksc_ref = nxt() if quant else None
        vsc_ref = nxt() if quant else None
        (qkv_k_ref, qkv_b_ref, out_k_ref, out_b_ref,
         ln1s_ref, ln1b_ref, ln2s_ref, ln2b_ref,
         mlp_k_ref, mlp_b_ref) = (nxt() for _ in range(10))  # VMEM blocks
        qkv_s_ref = nxt() if w_quant else None     # per-column weight scales
        out_s_ref = nxt() if w_quant else None
        mlp_s_ref = nxt() if w_quant else None
        x_out_ref = nxt()
        uc_out_ref = nxt()
        kc_out_ref, vc_out_ref = nxt(), nxt()
        ksc_out_ref = nxt() if quant else None
        vsc_out_ref = nxt() if quant else None
        xs_ref = nxt()                                      # VMEM (n, width)
        khist_ref, vhist_ref = nxt(), nxt()                 # (2, chunk, hd, nh_t)
        kshist_ref = nxt() if quant else None
        vshist_ref = nxt() if quant else None
        kcol_ref, vcol_ref = nxt(), nxt()                   # (blocks, 1, hd, nh_t)
        kscol_ref = nxt() if quant else None
        vscol_ref = nxt() if quant else None
        kt_ref, vt_ref = nxt(), nxt()                       # staging
        kst_ref = nxt() if quant else None
        vst_ref = nxt() if quant else None
        m_ref, s_ref = nxt(), nxt()                         # (1, nh_t) f32
        acc_ref = nxt()                                     # (hd, nh_t) f32
        attn_ref = nxt()                                    # (hd, nh) f32
        hist_sems, col_sems, write_sems = nxt(), nxt(), nxt()

        li = pl.program_id(0)
        t = scalar_ref[0, 0]
        b = t // block_len
        i = t - b * block_len
        b_prev = jnp.maximum(b - 1, 0)
        pat = pat_ref[0, li]

        @pl.when(li == 0)
        def _():
            xs_ref[:] = x_ref[:]

        def ln(x, scale, bias):
            mu = jnp.mean(x, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
            return (x - mu) * jax.lax.rsqrt(var + 1e-6) * scale + bias

        def to_lane_major(a):
            return jnp.concatenate(
                [a[:, h * hd:(h + 1) * hd].T for h in range(heads)], axis=1)

        def from_lane_major(a):
            return jnp.concatenate(
                [a[:, h * n:(h + 1) * n].T for h in range(heads)], axis=1)

        def _f32(a):
            return a.astype(jnp.float32) if quant else a

        hist_srcs = ((kc_ref, vc_ref, ksc_ref, vsc_ref) if quant
                     else (kc_ref, vc_ref))
        hist_dsts = ((khist_ref, vhist_ref, kshist_ref, vshist_ref) if quant
                     else (khist_ref, vhist_ref))
        col_dsts = ((kcol_ref, vcol_ref, kscol_ref, vscol_ref) if quant
                    else (kcol_ref, vcol_ref))

        x = xs_ref[:]                                       # (n, width) f32
        u = ln(x, ln1s_ref[0], ln1b_ref[0])
        uc_li = uc_ref[0]                                   # (n, 2, width)
        u0 = uc_li[:, 0, :]
        u1 = uc_li[:, 1, :]
        wdt = jnp.bfloat16 if w_quant else qkv_k_ref.dtype

        def wdot(a, w):
            # bf16-streamed weights run the MXU in bf16 with f32 accumulate;
            # f32 weights keep the f32 path (exactness tests).  int8-streamed
            # weights (w_quant) dequantize with a bare int8->bf16 convert —
            # the per-column scale is applied to the small (n, cols) matmul
            # RESULT by the caller, never to the streamed elements.
            if w_quant:
                w = w.astype(jnp.bfloat16)
            return jnp.dot(a.astype(wdt), w,
                           preferred_element_type=jnp.float32)

        qkv = (wdot(u0, qkv_k_ref[0, 0]) + wdot(u1, qkv_k_ref[0, 1])
               + wdot(u, qkv_k_ref[0, 2]))
        if w_quant:
            qkv = qkv * qkv_s_ref[0]
        qkv = qkv + qkv_b_ref[0].astype(jnp.float32)
        uc_out_ref[0, :, 0] = u1
        uc_out_ref[0, :, 1] = u

        q_t = to_lane_major(qkv[:, :hh])                    # (hd, NH)
        k_t = to_lane_major(qkv[:, hh:2 * hh])
        v_t = to_lane_major(qkv[:, 2 * hh:])

        def _quantize(a):
            amax = jnp.max(jnp.abs(a), axis=0, keepdims=True)
            scale = (amax * jnp.float32(1.0 / 127.0)).astype(SCALE_DTYPE)
            s = scale.astype(jnp.float32)
            inv = jnp.where(s > 0, 1.0 / jnp.where(s > 0, s, 1.0), 0.0)
            q = jnp.clip(jnp.round(a * inv), -127.0, 127.0).astype(jnp.int8)
            return q, scale

        def _quantize4(a):
            # int4: [-7, 7] with per-lane scale; the two hd halves pack as
            # (low nibble = rows [0, hd/2), high nibble = rows [hd/2, hd)).
            amax = jnp.max(jnp.abs(a), axis=0, keepdims=True)
            scale = (amax * jnp.float32(1.0 / 7.0)).astype(SCALE_DTYPE)
            s = scale.astype(jnp.float32)
            inv = jnp.where(s > 0, 1.0 / jnp.where(s > 0, s, 1.0), 0.0)
            q = jnp.clip(jnp.round(a * inv), -7.0, 7.0).astype(jnp.int8)
            lo = jax.lax.slice_in_dim(q, 0, hd2, axis=0)
            hi = jax.lax.slice_in_dim(q, hd2, hd, axis=0)
            packed = jnp.bitwise_or(jnp.bitwise_and(lo, jnp.int8(0x0F)),
                                    jnp.left_shift(hi, 4))
            return packed, scale

        def _unpack4(a):
            # (arithmetic shifts sign-extend both nibbles)
            lo = jnp.right_shift(jnp.left_shift(a, 4), 4)
            hi = jnp.right_shift(a, 4)
            return lo.astype(jnp.float32), hi.astype(jnp.float32)

        for ti in range(lane_tiles):
            k_seg = k_t[:, ti * nh_t:(ti + 1) * nh_t]
            v_seg = v_t[:, ti * nh_t:(ti + 1) * nh_t]
            if quant:
                qz = _quantize4 if quant4 else _quantize
                kq, ks_cur = qz(k_seg)
                vq, vs_cur = qz(v_seg)
                kt_ref[ti, 0, 0] = kq
                vt_ref[ti, 0, 0] = vq
                kst_ref[ti, 0, 0] = ks_cur
                vst_ref[ti, 0, 0] = vs_cur
            else:
                kt_ref[ti, 0, 0] = k_seg.astype(cache_dtype)
                vt_ref[ti, 0, 0] = v_seg.astype(cache_dtype)
        wk = pltpu.make_async_copy(
            kt_ref, kc_out_ref.at[li, :, pl.ds(b, 1), pl.ds(i, 1), :, :],
            write_sems.at[0])
        wv = pltpu.make_async_copy(
            vt_ref, vc_out_ref.at[li, :, pl.ds(b, 1), pl.ds(i, 1), :, :],
            write_sems.at[1])
        wk.start()
        wv.start()
        if quant:
            wks = pltpu.make_async_copy(
                kst_ref, ksc_out_ref.at[li, :, pl.ds(b, 1), pl.ds(i, 1), :, :],
                write_sems.at[2])
            wvs = pltpu.make_async_copy(
                vst_ref, vsc_out_ref.at[li, :, pl.ds(b, 1), pl.ds(i, 1), :, :],
                write_sems.at[3])
            wks.start()
            wvs.start()

        row_ids = jax.lax.broadcasted_iota(jnp.int32, (chunk, nh_t), 0)
        blk_ids = jax.lax.broadcasted_iota(jnp.int32, (blocks, nh_t), 0)

        for ti in range(lane_tiles):
            def hist_chunk_dma(c, part, blk, ti=ti):
                """Chunk c of history block ``blk`` of THIS layer -> slot
                c%2 (tile-major cache: one contiguous burst per chunk)."""
                slot = c % hist_slots
                src = hist_srcs[part].at[li, ti, pl.ds(blk, 1),
                                         pl.ds(c * chunk, chunk), :, :]
                dst = hist_dsts[part].at[pl.ds(slot, 1), pl.ds(0, chunk)]
                return pltpu.make_async_copy(src, dst,
                                             hist_sems.at[slot, part])

            def col_dma(part, ti=ti):
                src = hist_srcs[part].at[li, ti, :, pl.ds(i, 1), :, :]
                return pltpu.make_async_copy(src, col_dsts[part],
                                             col_sems.at[part])

            ts = ti * nh_t
            q_s = jax.lax.slice_in_dim(q_t, ts, ts + nh_t, axis=1)
            k_s = jax.lax.slice_in_dim(k_t, ts, ts + nh_t, axis=1)
            v_s = jax.lax.slice_in_dim(v_t, ts, ts + nh_t, axis=1)
            logit_cur = (jnp.sum(k_s * q_s, axis=0, keepdims=True)
                         * inv_sqrt_hd)

            # ---- row / prev_row: online-softmax over history chunks ------
            def run_hist(blk, hi, with_mask):
                """Flash-decoding accumulate over chunks c with
                c*chunk < hi of history block ``blk``; with_mask masks rows
                at global offset >= i (row pattern)."""
                m_ref[:] = jnp.full((1, nh_t), neg, jnp.float32)
                s_ref[:] = jnp.zeros((1, nh_t), jnp.float32)
                acc_ref[:] = jnp.zeros((hd, nh_t), jnp.float32)
                for c in range(min(hist_slots, n_chunks)):
                    @pl.when(c * chunk < hi)
                    def _(c=c):
                        for part in range(n_parts):
                            hist_chunk_dma(c, part, blk).start()
                for c in range(n_chunks):
                    cs = c * chunk

                    @pl.when(cs < hi)
                    def _(c=c, cs=cs):
                        slot = c % hist_slots
                        for part in range(n_parts):
                            hist_chunk_dma(c, part, blk).wait()
                        k_h = khist_ref[slot, :chunk]       # (chunk, hd, nh_t)
                        v_h = vhist_ref[slot, :chunk]
                        if quant4:
                            k_lo, k_hi = _unpack4(k_h)
                            q_lo = jnp.expand_dims(
                                jax.lax.slice_in_dim(q_s, 0, hd2, axis=0), 0)
                            q_hi = jnp.expand_dims(
                                jax.lax.slice_in_dim(q_s, hd2, hd, axis=0), 0)
                            lg = (jnp.sum(k_lo * q_lo, axis=1)
                                  + jnp.sum(k_hi * q_hi, axis=1)) * inv_sqrt_hd
                        elif hist_bf16:
                            # bf16 history math (perf-lab knob): the int8->
                            # f32 convert + f32 multiply over every history
                            # element is the kernel's VPU hot loop; bf16
                            # converts/multiplies with f32 accumulation test
                            # whether the VPU runs packed bf16 faster.
                            lg = jnp.sum(
                                k_h.astype(jnp.bfloat16)
                                * jnp.expand_dims(
                                    q_s.astype(jnp.bfloat16), 0),
                                axis=1, dtype=jnp.float32) * inv_sqrt_hd
                        else:
                            lg = jnp.sum(_f32(k_h) * jnp.expand_dims(q_s, 0),
                                         axis=1) * inv_sqrt_hd
                        if quant:
                            lg = lg * kshist_ref[slot, :chunk, 0].astype(
                                jnp.float32)
                        if with_mask:
                            keep = row_ids + cs < i
                            lg = jnp.where(keep, lg, neg)
                        m_old = m_ref[:]
                        m_new = jnp.maximum(
                            m_old, jnp.max(lg, axis=0, keepdims=True))
                        alpha = jnp.exp(m_old - m_new)
                        p = jnp.exp(lg - m_new)             # (chunk, nh_t)
                        s_ref[:] = (s_ref[:] * alpha
                                    + jnp.sum(p, axis=0, keepdims=True))
                        if quant:
                            p = p * vshist_ref[slot, :chunk, 0].astype(
                                jnp.float32)
                        if with_mask:
                            # Re-mask AFTER the v-scale multiply (advisor r4):
                            # the masked rows include position i, whose cache
                            # entry is being DMA-written concurrently — a torn
                            # read yielding a NaN bit pattern would survive
                            # p==0 (0*NaN=NaN) without this hard zero.
                            p = jnp.where(keep, p, 0.0)
                        if quant4:
                            v_lo, v_hi = _unpack4(v_h)
                            pe = jnp.expand_dims(p, 1)
                            acc_ref[:] = (acc_ref[:] * alpha
                                          + jnp.concatenate(
                                              [jnp.sum(pe * v_lo, axis=0),
                                               jnp.sum(pe * v_hi, axis=0)],
                                              axis=0))
                        elif hist_bf16:
                            acc_ref[:] = (acc_ref[:] * alpha + jnp.sum(
                                jnp.expand_dims(p.astype(jnp.bfloat16), 1)
                                * v_h.astype(jnp.bfloat16),
                                axis=0, dtype=jnp.float32))
                        else:
                            acc_ref[:] = (acc_ref[:] * alpha
                                          + jnp.sum(jnp.expand_dims(p, 1)
                                                    * _f32(v_h), axis=0))
                        m_ref[:] = m_new
                        # Slot consumed — refill for chunk c+hist_slots
                        # (started only after this chunk's values were read,
                        # matching the unrolled kernel's consume-then-refill
                        # discipline; hist_slots=3 keeps 2 DMAs in flight).
                        if c + hist_slots < n_chunks:
                            @pl.when((c + hist_slots) * chunk < hi)
                            def _(c=c):
                                for part in range(n_parts):
                                    hist_chunk_dma(c + hist_slots, part,
                                                   blk).start()

            @pl.when(pat == 0)
            def _():
                # row: history strictly below offset i, current appended.
                run_hist(b, i, with_mask=True)
                m_old = m_ref[:]
                m_new = jnp.maximum(m_old, logit_cur)
                alpha = jnp.exp(m_old - m_new)
                p_cur = jnp.exp(logit_cur - m_new)
                s = s_ref[:] * alpha + p_cur
                acc = acc_ref[:] * alpha + p_cur * v_s
                attn_ref[:, ts:ts + nh_t] = acc / s

            @pl.when(jnp.logical_and(pat == 2, b > 0))
            def _():
                # prev_row: whole previous block — fully written by earlier
                # steps, so no read ever races the current position's cache
                # write (advisor r4: the old b==0 path walked the
                # concurrently-written block and relied on a final
                # *(b>0) zero multiply, which a torn-read NaN survives).
                run_hist(b_prev, block_len, with_mask=False)
                attn_ref[:, ts:ts + nh_t] = (
                    acc_ref[:] / jnp.maximum(s_ref[:], 1e-30))

            @pl.when(jnp.logical_and(pat == 2, b == 0))
            def _():
                # prev_row at block 0 is zero by definition — no DMA, no math.
                attn_ref[:, ts:ts + nh_t] = jnp.zeros((hd, nh_t), jnp.float32)

            @pl.when(pat == 1)
            def _():
                # col: column i across blocks < b, current appended (small —
                # whole slab, ordinary softmax).
                for part in range(n_parts):
                    col_dma(part).start()
                for part in range(n_parts):
                    col_dma(part).wait()
                k_h = kcol_ref[:, 0]                        # (blocks, hd, nh_t)
                v_h = vcol_ref[:, 0]
                if quant4:
                    k_lo, k_hi = _unpack4(k_h)
                    q_lo = jnp.expand_dims(
                        jax.lax.slice_in_dim(q_s, 0, hd2, axis=0), 0)
                    q_hi = jnp.expand_dims(
                        jax.lax.slice_in_dim(q_s, hd2, hd, axis=0), 0)
                    lg = (jnp.sum(k_lo * q_lo, axis=1)
                          + jnp.sum(k_hi * q_hi, axis=1)) * inv_sqrt_hd
                else:
                    lg = jnp.sum(_f32(k_h) * jnp.expand_dims(q_s, 0),
                                 axis=1) * inv_sqrt_hd
                if quant:
                    lg = lg * kscol_ref[:, 0, 0].astype(jnp.float32)
                lg = jnp.where(blk_ids < b, lg, neg)
                full = jnp.concatenate([lg, logit_cur], axis=0)
                w = jax.nn.softmax(full, axis=0)            # (blocks+1, nh_t)
                w_blk = jax.lax.slice_in_dim(w, 0, blocks, axis=0)
                if quant:
                    w_blk = w_blk * vscol_ref[:, 0, 0].astype(jnp.float32)
                # Hard-zero the masked blocks AFTER the scale multiply: the
                # col DMA reads column i of EVERY block including block b,
                # whose (b, i) entry is being written concurrently — the
                # underflowed softmax zero would not survive a torn-read NaN
                # in the value/scale (0*NaN=NaN).
                w_blk = jnp.where(blk_ids < b, w_blk, 0.0)
                w_cur = jax.lax.slice_in_dim(w, blocks, blocks + 1, axis=0)
                if quant4:
                    v_lo, v_hi = _unpack4(v_h)
                    we = jnp.expand_dims(w_blk, 1)
                    attn_ref[:, ts:ts + nh_t] = jnp.concatenate(
                        [jnp.sum(we * v_lo, axis=0),
                         jnp.sum(we * v_hi, axis=0)], axis=0) + w_cur * v_s
                else:
                    attn_ref[:, ts:ts + nh_t] = (
                        jnp.sum(jnp.expand_dims(w_blk, 1) * _f32(v_h), axis=0)
                        + w_cur * v_s)

        attn_nh = from_lane_major(attn_ref[:])              # (n, hh)
        res1 = wdot(attn_nh, out_k_ref[0])
        if w_quant:
            res1 = res1 * out_s_ref[0]
        res1 = res1 + out_b_ref[0].astype(jnp.float32)
        h = ln(x + res1, ln2s_ref[0], ln2b_ref[0])
        res2 = wdot(h, mlp_k_ref[0])
        if w_quant:
            res2 = res2 * mlp_s_ref[0]
        res2 = res2 + mlp_b_ref[0].astype(jnp.float32)
        xs_ref[:] = res2 + res1 + x

        wk.wait()
        wv.wait()
        if quant:
            wks.wait()
            wvs.wait()

        @pl.when(li == depth - 1)
        def _():
            x_out_ref[:] = xs_ref[:]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("depth", "n", "heads", "hd", "width", "blocks",
                     "block_len", "interpret", "lane_tiles", "chunk",
                     "hist_bf16", "hist_slots", "packed_int4"))
def grid_decode_step(
    scalars: jnp.ndarray,   # (1, 1) int32: [t]
    pattern_arr: jnp.ndarray,  # (1, depth) int32 attention-pattern table
    x: jnp.ndarray,         # (N, width) f32
    uc: jnp.ndarray,        # (depth, N, 2, width) f32
    kc: jnp.ndarray,        # (depth, lane_tiles, blocks, block_len, hd, nh_t)
    vc: jnp.ndarray,        #   f32 / bf16 / int8 — decode_cache_shape layout
    weights: Tuple[jnp.ndarray, ...],
    *,
    kscale=None,
    vscale=None,
    wscales: Optional[Tuple[jnp.ndarray, ...]] = None,  # int8 weights: per-
                            # column f32 scales (qkv_s, out_s, mlp_s), each
                            # (depth, cols) — quantize_weight_cols layout
    depth: int, n: int, heads: int, hd: int, width: int,
    blocks: int, block_len: int,
    interpret=False,
    lane_tiles: int = 0,
    chunk: int = 0,         # 0 = auto (grid_decode_chunk)
    hist_bf16: bool = False,  # bf16 history converts/multiplies (perf knob)
    hist_slots: int = 2,    # history chunk pipeline depth (perf knob)
    packed_int4: bool = False,  # int8 caches hold two int4 nibbles per byte
                            # (hd axis halved) — the batch-128 capacity mode
):
    """One decode step over ``grid=(depth,)``: layer li at grid step li.

    ``weights`` is the SAME stacked tuple the unrolled kernel takes
    (qkv_k, qkv_b, out_k, out_b, ln1s, ln1b, ln2s, ln2b, mlp_k, mlp_b, all
    leading-depth) — the matrices may be bf16 for streamed serving.  Returns
    (x_out, uc, kc, vc[, ks, vs]); caches aliased in place.  The logits
    head / sampling run OUTSIDE (XLA)."""
    nh = n * heads
    cache_dtype = kc.dtype
    quant = jnp.dtype(cache_dtype) == jnp.dtype(jnp.int8)
    assert quant == (kscale is not None) == (vscale is not None)
    assert not (packed_int4 and not quant), "int4 packs into int8 storage"
    hd_store = hd // 2 if packed_int4 else hd
    assert kc.shape[4] == hd_store, (kc.shape, hd_store)
    if not interpret:
        assert nh % LANE == 0, (
            f"fused decode needs batch*heads % {LANE} == 0, got {nh}")
    assert kc.ndim == 6, "caches are tile-major — use decode_cache_shape"
    if lane_tiles == 0:
        lane_tiles = kc.shape[1]
    assert kc.shape[1] == lane_tiles and nh % lane_tiles == 0
    nh_t = nh // lane_tiles
    if chunk == 0:
        chunk = grid_decode_chunk(block_len, hd_store, nh_t,
                                  jnp.dtype(cache_dtype).itemsize)
    assert block_len % chunk == 0
    w_quant = wscales is not None
    assert w_quant == (jnp.dtype(weights[0].dtype) == jnp.dtype(jnp.int8))
    n_parts = 4 if quant else 2
    kernel = _make_grid_kernel(depth, n, heads, hd, width, blocks, block_len,
                               chunk, cache_dtype, lane_tiles,
                               w_quant=w_quant, hist_bf16=hist_bf16,
                               hist_slots=hist_slots, quant4=packed_int4)

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    def vmem_full(shape):
        # Whole-array VMEM block, same for every grid step (copied once).
        return pl.BlockSpec(shape, lambda li: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    def per_layer(shape):
        # Leading-depth arrays stream one layer block per grid step — the
        # Mosaic pipeline double-buffers the next layer's DMA behind compute.
        nd = len(shape)
        return pl.BlockSpec((1,) + shape[1:],
                            lambda li: (li,) + (0,) * (nd - 1),
                            memory_space=pltpu.VMEM)

    # Mosaic's BlockSpec rule wants a block's last two dims divisible by
    # (8, 128) or equal to the array's; lift 2D per-layer vectors (biases,
    # layernorm params) to (depth, 1, X) so their (1, 1, X) blocks qualify.
    weights = tuple(w.reshape(w.shape[0], 1, w.shape[1]) if w.ndim == 2
                    else w for w in weights)
    w_specs = [per_layer(w.shape) for w in weights]
    wscale_args = ()
    if w_quant:
        wscale_args = tuple(s.reshape(s.shape[0], 1, s.shape[1])
                            for s in wscales)
        w_specs += [per_layer(s.shape) for s in wscale_args]
    scale_args = [kscale, vscale] if quant else []
    scale_specs = [any_spec] * len(scale_args)
    scale_shapes = [jax.ShapeDtypeStruct(s.shape, s.dtype)
                    for s in scale_args]
    scale_scratch = ([
        pltpu.VMEM((hist_slots, chunk, 1, nh_t), SCALE_DTYPE),   # kshist
        pltpu.VMEM((hist_slots, chunk, 1, nh_t), SCALE_DTYPE),   # vshist
    ] if quant else [])
    scale_col_scratch = ([
        pltpu.VMEM((blocks, 1, 1, nh_t), SCALE_DTYPE),      # kscol
        pltpu.VMEM((blocks, 1, 1, nh_t), SCALE_DTYPE),      # vscol
    ] if quant else [])
    scale_staging = ([
        pltpu.VMEM((lane_tiles, 1, 1, 1, nh_t), SCALE_DTYPE),
        pltpu.VMEM((lane_tiles, 1, 1, 1, nh_t), SCALE_DTYPE),
    ] if quant else [])
    # uc/kc/vc(/ks/vs) updated in place: input j (after scalars, patterns,
    # x) -> output j-2 (outputs: x_out, uc, kc, vc[, ks, vs]).
    aliases = {j: j - 2 for j in range(3, 6 + len(scale_args))}

    out = pl.pallas_call(
        kernel,
        grid=(depth,),
        in_specs=([smem, smem,
                   vmem_full(x.shape),
                   per_layer(uc.shape),
                   any_spec, any_spec] + scale_specs + w_specs),
        out_specs=[vmem_full(x.shape), per_layer(uc.shape),
                   any_spec, any_spec] + scale_specs,
        out_shape=[
            jax.ShapeDtypeStruct((n, width), jnp.float32),
            jax.ShapeDtypeStruct(uc.shape, jnp.float32),
            jax.ShapeDtypeStruct(kc.shape, cache_dtype),
            jax.ShapeDtypeStruct(vc.shape, cache_dtype),
        ] + scale_shapes,
        input_output_aliases=aliases,
        scratch_shapes=[
            pltpu.VMEM((n, width), jnp.float32),            # xs residual
            pltpu.VMEM((hist_slots, chunk, hd_store, nh_t), cache_dtype),
            pltpu.VMEM((hist_slots, chunk, hd_store, nh_t), cache_dtype),
        ] + scale_scratch + [
            pltpu.VMEM((blocks, 1, hd_store, nh_t), cache_dtype),  # kcol
            pltpu.VMEM((blocks, 1, hd_store, nh_t), cache_dtype),  # vcol
        ] + scale_col_scratch + [
            pltpu.VMEM((lane_tiles, 1, 1, hd_store, nh_t), cache_dtype),
            pltpu.VMEM((lane_tiles, 1, 1, hd_store, nh_t), cache_dtype),
        ] + scale_staging + [
            pltpu.VMEM((1, nh_t), jnp.float32),             # m running max
            pltpu.VMEM((1, nh_t), jnp.float32),             # s running sum
            pltpu.VMEM((hd, nh_t), jnp.float32),            # acc
            pltpu.VMEM((hd, nh), jnp.float32),              # attn (all tiles)
            pltpu.SemaphoreType.DMA((hist_slots, n_parts)),  # hist chunk sems
            pltpu.SemaphoreType.DMA((n_parts,)),            # col sems
            pltpu.SemaphoreType.DMA((n_parts,)),            # write sems
        ],
        interpret=_interp(interpret),
        compiler_params=(pltpu.CompilerParams(
            has_side_effects=True,
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ) if _HAS_PLTPU and not interpret else None),
    )(scalars, pattern_arr, x, uc, kc, vc, *scale_args, *weights,
      *wscale_args)
    return out
