"""Fused decode-step kernel (Pallas/TPU).

One kernel executes ALL transformer layers of a single autoregressive decode
step (the body of the lax.scan in vae_music_tpu.sample.decode).  The XLA path
issues ~30 small HLOs per layer per step; fusing the step removes that
per-op overhead and reads only the pattern-relevant cache slices from HBM.

Cache layout is lane-major AND lane-tile-major:
(depth, lane_tiles, blocks, block_len, hd, nh_t) with the batchxheads product
split across ``lane_tiles`` tiles of nh_t lanes each (nh_t a multiple of 128;
Mosaic's DMA engine requires the trailing copy dims tile-aligned).  Every
pattern+tile is then one FULLY CONTIGUOUS rectangular DMA:

      row      -> [li, ti, b]        (current block)        (1, l, hd, nh_t)
      col      -> [li, ti, :, i]     (column i, all blocks) (blocks, 1, hd, nh_t)
      prev_row -> [li, ti, b-1]      (previous block)       (1, l, hd, nh_t)

Tile-major matters because the r2 layout (depth, blocks, block_len, hd, nh)
made every lane-tiled history DMA strided: a 2-tile batch-256 read fetched
512-byte lane slices on a 1024-byte stride, and batch-512's 4 tiles ran
256-byte slices on the same stride.  Measured on v5e (flagship level-0
decode, bf16 caches): f32-cache step 101.8 -> 90.9 us and single-scan
batch-512 125.6 -> 117.7 us from the contiguity alone; bf16 batch-256 is
within run-to-run noise (the 2-tile 512B runs were already near this chip's
~480 GB/s single-kernel effective bandwidth — see the in-flight-bytes note
on the slot count below), and the layout decouples VMEM tiling from DMA
efficiency for every future tiling choice.

The CURRENT position's k/v never round-trip through HBM: attention treats
them as an extra in-register key (history is masked strictly below the
current offset), so the cache write DMA can overlap compute.  Folded weights
(per-head projections pre-multiplied into the causal-conv and output kernels
— see sample/decode.py) stay VMEM-resident; attention math runs lane-parallel
over N*H with sublane reductions over keys.

The history reads are DOUBLE-BUFFERED ACROSS LAYERS: each row/prev_row
(layer, tile) job's cache slice depends only on (b, i), so its DMA is issued
while earlier layers compute, hiding HBM latency (measured on v5e at the
flagship batch-256 geometry: 78.8 -> 70.9 us/step for the kernel alone).
With ``fused_decode_step_sample`` the kernel additionally runs the logits
head, Gumbel-max/greedy sampling (hardware PRNG) and the next token's
input embedding, shrinking the scan body to one kernel + scalar bookkeeping
(70.9 -> 58.1 us/step; chain throughput 25.2k -> 38.4k clips/s with bf16
serving stacks).

Constraints: N*heads must be a multiple of 128 on real TPUs (use the XLA path
otherwise); interpret mode (CPU tests) has no alignment constraint.
Attention lanes are processed in tiles (``lane_tiles``, auto-sized) so the
VMEM scratch stays bounded at any batch; the prefetch pipeline makes the
per-tile DMAs effectively free, and batch 256 remains the throughput sweet
spot (512 -> 32.6k clips/s with the chunked row reads).
Numerics match the XLA path (f32 softmax, -1e9 masking); equality is enforced
by tests/test_decode_pallas.py (token-exact under greedy) and the
decode==full-forward invariant.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

LANE = 128

# History-read pipeline depth (slots of khist/vhist scratch).  The DMA probe
# on v5e measured 22MB of decode-step-sized reads at 581 GB/s with 2 slots
# vs 616-641 GB/s with 3-4 slots (more in-flight bytes cover the
# latency-bandwidth product); the per-config winner is set by
# scripts/decode_lab.py measurements — flagship level-0 decode: 3 slots
# 41.9 us/step vs 2 slots 43.5 (batch 256), 100.7 vs 106.0 (batch 512,
# single-scan); 4 slots gains nothing further and regresses batch 256.
HIST_SLOTS = 3


def _bisect_ge_threshold(scores: jnp.ndarray,
                         weights: jnp.ndarray,
                         target: jnp.ndarray) -> jnp.ndarray:
    """(N, B) f32 -> (N, 1): per row, the LARGEST element value ``v`` with
    ``sum(weights * (scores >= v)) >= target``.

    Sort-free: 32-step bisection on the monotonic-int image of the floats
    (IEEE f32 bit patterns with the sign handled via ``s ^ 0x7fffffff`` for
    negatives order like integers), reducing ``where(scores >= mid, w, 0)``
    per row.  Each pass is a cheap compare+select+lane-reduction with no
    data-dependent control flow — Mosaic- and jit-friendly, shared by the
    fused decode kernel's in-kernel top-k (unit weights, target=k) and
    top-p (softmax-prob weights, target=top_p*Z) threshold searches.

    Because the weighted mass is a step function that only changes at actual
    element values, the converged ``lo`` is always one of the row's values.
    """
    n = scores.shape[0]
    s = jax.lax.bitcast_convert_type(scores, jnp.int32)
    key = jnp.where(s < 0, s ^ jnp.int32(0x7FFFFFFF), s)     # monotonic
    lo = jnp.full((n, 1), jnp.iinfo(jnp.int32).min, jnp.int32)
    hi = jnp.full((n, 1), jnp.iinfo(jnp.int32).max, jnp.int32)
    zero = jnp.zeros_like(weights)
    for _ in range(32):
        # overflow-safe floor average of two int32s
        mid = (lo >> 1) + (hi >> 1) + (lo & hi & 1)
        mass = jnp.sum(jnp.where(key >= mid, weights, zero), axis=1,
                       keepdims=True)
        ok = mass >= target      # invariant: mass_ge(lo) >= target > mass_ge(hi)
        lo = jnp.where(ok, mid, lo)
        hi = jnp.where(ok, hi, mid)
    back = jnp.where(lo < 0, lo ^ jnp.int32(0x7FFFFFFF), lo)
    return jax.lax.bitcast_convert_type(back, jnp.float32)


def kth_largest_threshold(scores: jnp.ndarray, k: int) -> jnp.ndarray:
    """(N, B) f32 -> (N, 1) the k-th largest value per row, EXACTLY.

    Unit-weight instance of :func:`_bisect_ge_threshold` (VERDICT r2 #6:
    "top-k needs only the k-th largest score per lane ... threshold refine").
    Matches ``jnp.sort(scores, axis=-1)[:, -k, None]`` bit-for-bit for
    finite inputs (tie semantics included: masking ``scores >= kth`` keeps
    ties, exactly like sample/decode.py's XLA top-k path).
    """
    ones = jnp.ones(scores.shape, jnp.float32)
    return _bisect_ge_threshold(scores, ones,
                                jnp.full((scores.shape[0], 1), float(k),
                                         jnp.float32))


def top_p_cutoff_threshold(scores: jnp.ndarray, top_p: float) -> jnp.ndarray:
    """(N, B) f32 logits -> (N, 1) the nucleus cutoff: the smallest logit
    kept by top-p, so masking ``scores < cutoff`` keeps exactly the smallest
    descending-prob prefix whose cumulative mass reaches ``top_p`` (threshold
    token included — the same semantics as sample/decode.py's sort+cumsum
    XLA path, ties at the cutoff all surviving).

    Sort-free: the XLA cutoff equals the largest element value ``v`` with
    ``sum(softmax(scores) * (scores >= v)) >= top_p`` (the cumulative-mass
    prefix condition restated on the unsorted row), which is one weighted
    bisection.  Used by the fused decode kernel's in-kernel top-p.  The
    ``max(top_p, 1e-9)`` floor keeps the top token selectable even at
    ``top_p <= 0``, mirroring the XLA path.
    """
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)                       # unnormalized softmax
    z = jnp.sum(p, axis=-1, keepdims=True)
    target = jnp.float32(max(float(top_p), 1e-9)) * z
    return _bisect_ge_threshold(scores, p, target)


def decode_pallas_available(n_samples: int = LANE, heads: int = 1) -> bool:
    # TPU-only kernel; TPU plugin backends report names like 'axon', so
    # exclude the known non-TPU backends rather than matching 'tpu'.
    return (_HAS_PLTPU
            and jax.default_backend() not in ("cpu", "gpu", "cuda", "rocm")
            and (n_samples * heads) % LANE == 0)


# int8-cache per-(position, lane) scale dtype.  f32, NOT bf16: the scale
# caches' second-minor dim is 1, and Mosaic's bf16 sublane packing (2 rows
# per 32-bit word) rejects size-1 memref slices along that dim ("slice shape
# along dimension 4 must be aligned to tiling (2)"); f32 packs 1 row/word so
# the size-1 slices are always aligned.  Cost: the scale side caches are 4x
# the values' bytes/row instead of 2x — still hd/4-fold smaller than the
# value caches (hd=16 at the flagship geometry).
#
# MEASURED (v5e, flagship level-0 decode, scripts/decode_lab.py dtype=int8):
# int8 LOSES to bf16 — 55.2 vs 42.0 us/step (batch 256), 103.8 vs ~101
# (batch 512).  The 37.5% DMA saving (16+4 vs 32 bytes per (position, lane)
# per k/v at hd=16) does not pay for (a) the extra int8->f32 convert pass
# over every (l, hd, nh_t) history element on the VPU and (b) doubling the
# DMA part count (4 semaphore waits per history job instead of 2): after the
# r3 prefetch pipeline the kernel is balanced, not purely DMA-bound, so the
# convert lands on the critical path.  bf16 stays the production default.
# The large-hd hypothesis was tested and refuted (scripts/hd_lab.py,
# width-512 ctx-896: int8/bf16 = 1.32x/1.49x/1.85x at hd 16/64/128 — the
# convert pass scales with the values, so bigger hd is WORSE); int8 remains
# available (cache_dtype="int8") purely as a cache-capacity option.
SCALE_DTYPE = jnp.float32


def _make_kernel(depth, n, heads, hd, width, blocks, block_len, patterns,
                 cache_dtype=jnp.float32, lane_tiles=1, sample=None,
                 hist_slots=HIST_SLOTS):
    """Build the decode-step kernel.

    With ``sample`` (a dict: mode 'gumbel'|'greedy', bins_p, n_stream), the
    kernel additionally runs the WHOLE rest of the autoregressive step that
    the XLA scan body would otherwise issue as ~10 separate HLOs: the logits
    head, Gumbel-max/greedy token sampling (TPU hardware PRNG seeded with
    (seed0, seed1, t) — same Gumbel-max distribution as the reference's
    RelaxedOneHotCategorical+argmax, different random stream than threefry),
    and the next position's input embedding (exact one-hot gather on the MXU
    at HIGHEST precision, plus the precomputed pos+x_cond stream slice whose
    HBM DMA overlaps the transformer layers).

    ``cache_dtype=jnp.int8`` stores the KV history quantized per (position,
    lane): k/v rows are scaled by max|.| over the hd axis to int8, the f32
    scales living in side caches hd-fold smaller rows than the values.
    Because the scale is constant along hd, it FACTORS OUT of both attention
    reductions — logits = scale_k * sum(k_q * q) and the value sum reuses the
    softmax weights pre-multiplied by scale_v — so dequantization costs one
    extra elementwise multiply per pattern, while the dominant history DMA
    drops ~37% below bf16 at hd=16 (16+4 bytes vs 32 per cached
    (position, lane) per k/v).
    """
    nh = n * heads
    nh_t = nh // lane_tiles   # lanes per attention tile (VMEM working set)
    hh = heads * hd
    inv_sqrt_hd = 1.0 / math.sqrt(hd)
    quant = jnp.dtype(cache_dtype) == jnp.dtype(jnp.int8)
    n_parts = 4 if quant else 2   # DMA parts per history job: k, v [, ks, vs]

    def kernel(*refs):
        it = iter(refs)

        def nxt():
            return next(it)

        scalar_ref = nxt()                                  # SMEM (1, 1): t
        if sample is not None:
            seed_ref = nxt()                                # SMEM (1, 2)
        x_ref, uc_ref = nxt(), nxt()                        # VMEM
        kc_ref, vc_ref = nxt(), nxt()                       # ANY (HBM)
        ksc_ref = nxt() if quant else None                  # ANY: k scales
        vsc_ref = nxt() if quant else None                  # ANY: v scales
        (qkv_k_ref, qkv_b_ref, out_k_ref, out_b_ref,
         ln1s_ref, ln1b_ref, ln2s_ref, ln2b_ref,
         mlp_k_ref, mlp_b_ref) = (nxt() for _ in range(10))
        if sample is not None:
            head_k_ref, head_b_ref, emb_ref = nxt(), nxt(), nxt()  # VMEM
            stream_ref = nxt()                              # ANY (HBM)
        x_out_ref = nxt()
        if sample is not None:
            tok_ref = nxt()
        uc_out_ref, kc_out_ref, vc_out_ref = nxt(), nxt(), nxt()
        ksc_out_ref = nxt() if quant else None
        vsc_out_ref = nxt() if quant else None
        khist_ref, vhist_ref = nxt(), nxt()                 # VMEM scratch
        kshist_ref = nxt() if quant else None
        vshist_ref = nxt() if quant else None
        kcol_ref, vcol_ref = nxt(), nxt()
        kscol_ref = nxt() if quant else None
        vscol_ref = nxt() if quant else None
        kt_ref, vt_ref = nxt(), nxt()                       # VMEM staging
        kst_ref = nxt() if quant else None
        vst_ref = nxt() if quant else None
        if sample is not None:
            stream_scratch = nxt()
        logit_ref, acc_ref = nxt(), nxt()                   # row-chunk scratch
        read_sems, col_sems, aux_sems, write_sems = (nxt(), nxt(), nxt(),
                                                     nxt())
        # Block/offset bookkeeping lives here on the scalar unit (block_len
        # is compile-time constant), so the XLA scan body around the kernel
        # shrinks to a reshape of the loop counter.
        t = scalar_ref[0, 0]
        b = t // block_len
        i = t - b * block_len
        b_prev = jnp.maximum(b - 1, 0)

        if sample is not None:
            # Next position's pos(+x_cond) slice: in flight during the layers.
            stream_dma = pltpu.make_async_copy(
                stream_ref.at[pl.ds(t + 1, 1)], stream_scratch,
                aux_sems.at[0])
            stream_dma.start()
            if sample["mode"] in ("gumbel", "top_k", "top_p"):
                # Per-step stream: Mosaic takes at most two seed words, so
                # fold t in via golden-ratio mixing (int32 wraparound is fine).
                pltpu.prng_seed(
                    seed_ref[0, 0] + t * jnp.int32(-1640531527),
                    seed_ref[0, 1] ^ (t * jnp.int32(40503) + jnp.int32(1)))

        def ln(x, scale, bias):
            mu = jnp.mean(x, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
            return (x - mu) * jax.lax.rsqrt(var + 1e-6) * scale + bias

        def to_lane_major(a):
            """(N, hh) -> (hd, H*N), head-major lanes.

            Per-head transpose + lane concat — a flat reshape across the
            sublane/lane boundary would lower to an unsupported gather.
            """
            return jnp.concatenate(
                [a[:, h * hd:(h + 1) * hd].T for h in range(heads)], axis=1)

        def from_lane_major(a):
            """(hd, H*N) -> (N, hh), inverse of to_lane_major."""
            return jnp.concatenate(
                [a[:, h * n:(h + 1) * n].T for h in range(heads)], axis=1)

        x = x_ref[:]                                        # (N, width) f32
        neg = jnp.float32(-1e9)
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (block_len, nh_t), 0)
        blk_ids = jax.lax.broadcasted_iota(jnp.int32, (blocks, nh_t), 0)

        # Cross-layer double-buffered prefetch of the big history reads.  A
        # row/prev_row (layer, tile) job's source slice depends only on
        # (b, i) — known at kernel entry, NOT on the layer's activations — so
        # job j+2's DMA is issued the moment job j's slot is consumed, hiding
        # HBM latency behind the transformer compute.  The current position
        # (b, i) inside a prefetched row slice may race this step's cache
        # write, but that entry is strictly masked (offsets < i) so either
        # value is correct; prev_row reads block b-1, disjoint from the
        # write (and the b == 0 self-overlap case multiplies the output by 0).
        hist_jobs = [(li, ti) for li in range(depth)
                     if patterns[li] in (0, 2) for ti in range(lane_tiles)]
        # Row history beyond offset i is still unwritten this pass (positions
        # fill monotonically within a block), so its chunks need no DMA at
        # all — on average that halves the row-pattern reads.  Skipped
        # chunks never touch the VPU either: their logits are staged as -1e9
        # (the value the mask would apply) and the V accumulate is predicated
        # on the same `cs < i` condition, so stale scratch is never read.
        n_chunks = 4 if block_len % 4 == 0 else 1
        chunk = block_len // n_chunks

        hist_srcs = ((kc_ref, vc_ref, ksc_ref, vsc_ref) if quant
                     else (kc_ref, vc_ref))
        hist_dsts = ((khist_ref, vhist_ref, kshist_ref, vshist_ref) if quant
                     else (khist_ref, vhist_ref))

        def hist_chunk_dma(j, part, c):
            li_j, ti_j = hist_jobs[j]
            slot = j % hist_slots
            chunked = patterns[li_j] == 0 and n_chunks > 1
            blk = b if patterns[li_j] == 0 else b_prev
            rows = (pl.ds(c * chunk, chunk) if chunked
                    else slice(None))
            # Tile-major cache: the (layer, tile) slice is one contiguous
            # block — full HBM burst efficiency at any lane_tiles.
            src = hist_srcs[part].at[li_j, ti_j, pl.ds(blk, 1), rows, :, :]
            dst = hist_dsts[part].at[pl.ds(slot, 1), rows]
            return pltpu.make_async_copy(src, dst,
                                         read_sems.at[slot, part, c])

        def hist_start(j):
            li_j, _ = hist_jobs[j]
            slot = j % hist_slots
            if patterns[li_j] == 0 and n_chunks > 1:
                for c in range(n_chunks):
                    needed = c * chunk < i

                    @pl.when(needed)
                    def _(j=j, c=c):
                        for part in range(n_parts):
                            hist_chunk_dma(j, part, c).start()
            else:
                for part in range(n_parts):
                    hist_chunk_dma(j, part, 0).start()

        def hist_wait(j):
            li_j, _ = hist_jobs[j]
            if patterns[li_j] == 0 and n_chunks > 1:
                for c in range(n_chunks):
                    @pl.when(c * chunk < i)
                    def _(j=j, c=c):
                        for part in range(n_parts):
                            hist_chunk_dma(j, part, c).wait()
            else:
                for part in range(n_parts):
                    hist_chunk_dma(j, part, 0).wait()

        # Col-pattern reads get the same cross-layer prefetch treatment
        # (VERDICT r2 #2): the column slice kc[li, :, i] depends only on i —
        # known at kernel entry — so both buffered col jobs start before any
        # layer computes, and each consumed slot immediately refills for job
        # c+2.  The r2 kernel start/waited these inline, serializing an HBM
        # round-trip against compute once per col layer per tile.  The
        # current position's entry (b, i) inside the slice may race this
        # step's cache write, but col masks blocks >= b so either value is
        # correct; blocks beyond b are unwritten and equally masked.
        col_jobs = [(li, ti) for li in range(depth)
                    if patterns[li] == 1 for ti in range(lane_tiles)]

        col_dsts = ((kcol_ref, vcol_ref, kscol_ref, vscol_ref) if quant
                    else (kcol_ref, vcol_ref))

        def col_dma(c, part):
            li_c, ti_c = col_jobs[c]
            slot = c % 2
            # Tile-major: each block's (hd, nh_t) column slab is contiguous
            # (vs the r2 layout's 512B lane slices on a 1KB stride).
            src = hist_srcs[part].at[li_c, ti_c, :, pl.ds(i, 1), :, :]
            dst = col_dsts[part].at[slot]
            return pltpu.make_async_copy(src, dst, col_sems.at[slot, part])

        def col_start(c):
            for part in range(n_parts):
                col_dma(c, part).start()

        for c in range(min(2, len(col_jobs))):
            col_start(c)
        cidx = 0

        for j in range(min(hist_slots, len(hist_jobs))):
            hist_start(j)
        jidx = 0

        for li in range(depth):
            pattern = patterns[li]
            u = ln(x, ln1s_ref[li], ln1b_ref[li])
            uc_li = uc_ref[li]                              # (N, 2, width)
            u0 = uc_li[:, 0, :]
            u1 = uc_li[:, 1, :]
            qkv = (jnp.dot(u0, qkv_k_ref[li, 0], preferred_element_type=jnp.float32)
                   + jnp.dot(u1, qkv_k_ref[li, 1], preferred_element_type=jnp.float32)
                   + jnp.dot(u, qkv_k_ref[li, 2], preferred_element_type=jnp.float32)
                   + qkv_b_ref[li])
            uc_out_ref[li, :, 0] = u1
            uc_out_ref[li, :, 1] = u

            q_t = to_lane_major(qkv[:, :hh])                # (hd, NH)
            k_t = to_lane_major(qkv[:, hh:2 * hh])
            v_t = to_lane_major(qkv[:, 2 * hh:])

            # Stage current k/v per lane tile and write them to the HBM
            # cache — ONE strided DMA covers all tiles of a layer (tile
            # segments of hd*nh_t are contiguous in the tile-major layout).
            def _quantize(a):
                """(hd, nh_t) f32 -> int8 values + (1, nh_t) SCALE_DTYPE scale.

                Scale = max|.| over hd per lane; quantizing with the
                reciprocal of the STORED-precision scale makes the dequantized
                product scale*q exactly recoverable up to the int8 step."""
                amax = jnp.max(jnp.abs(a), axis=0, keepdims=True)
                scale = (amax * jnp.float32(1.0 / 127.0)).astype(SCALE_DTYPE)
                s = scale.astype(jnp.float32)
                inv = jnp.where(s > 0, 1.0 / jnp.where(s > 0, s, 1.0), 0.0)
                q = jnp.clip(jnp.round(a * inv), -127.0, 127.0).astype(
                    jnp.int8)
                return q, scale

            for ti in range(lane_tiles):
                k_seg = k_t[:, ti * nh_t:(ti + 1) * nh_t]
                v_seg = v_t[:, ti * nh_t:(ti + 1) * nh_t]
                if quant:
                    kq, ks_cur = _quantize(k_seg)
                    vq, vs_cur = _quantize(v_seg)
                    kt_ref[ti, 0, 0] = kq
                    vt_ref[ti, 0, 0] = vq
                    kst_ref[ti, 0, 0] = ks_cur
                    vst_ref[ti, 0, 0] = vs_cur
                else:
                    kt_ref[ti, 0, 0] = k_seg.astype(cache_dtype)
                    vt_ref[ti, 0, 0] = v_seg.astype(cache_dtype)
            wk = pltpu.make_async_copy(
                kt_ref, kc_out_ref.at[li, :, pl.ds(b, 1), pl.ds(i, 1), :, :],
                write_sems.at[li, 0])
            wv = pltpu.make_async_copy(
                vt_ref, vc_out_ref.at[li, :, pl.ds(b, 1), pl.ds(i, 1), :, :],
                write_sems.at[li, 1])
            wk.start()
            wv.start()
            if quant:
                wks = pltpu.make_async_copy(
                    kst_ref,
                    ksc_out_ref.at[li, :, pl.ds(b, 1), pl.ds(i, 1), :, :],
                    write_sems.at[li, 2])
                wvs = pltpu.make_async_copy(
                    vst_ref,
                    vsc_out_ref.at[li, :, pl.ds(b, 1), pl.ds(i, 1), :, :],
                    write_sems.at[li, 3])
                wks.start()
                wvs.start()

            # Attention runs per lane tile: the history scratch and its big
            # elementwise intermediates are sized (l, hd, nh_t), so the VMEM
            # working set is constant in batch — larger batches just add
            # tiles (all lane math is elementwise across lanes, so any
            # 128-aligned tiling is exact).
            attn_tiles = []
            for ti in range(lane_tiles):
                ts = ti * nh_t
                q_s = jax.lax.slice_in_dim(q_t, ts, ts + nh_t, axis=1)
                k_s = jax.lax.slice_in_dim(k_t, ts, ts + nh_t, axis=1)
                v_s = jax.lax.slice_in_dim(v_t, ts, ts + nh_t, axis=1)
                logit_cur = jnp.sum(k_s * q_s, axis=0, keepdims=True) * inv_sqrt_hd

                def _f32(a):
                    """History values enter the VPU math in f32 (int8 needs
                    the explicit convert; bf16 promotes on its own)."""
                    return a.astype(jnp.float32) if quant else a

                if pattern in (0, 2):  # row / prev_row: one block of history
                    slot = jidx % hist_slots
                    hist_wait(jidx)
                    k_hist = khist_ref[slot]                # (l, hd, nh_t)
                    v_hist = vhist_ref[slot]
                    if quant:
                        # Per-(position, lane) scales: constant along hd, so
                        # they multiply the REDUCED logits / the softmax
                        # weights, never the (l, hd, nh_t) intermediates.
                        ks_h = kshist_ref[slot, :, 0].astype(jnp.float32)
                        vs_h = vshist_ref[slot, :, 0].astype(jnp.float32)
                    if pattern == 0 and n_chunks > 1:
                        # Predicated per-chunk compute: a chunk entirely
                        # above offset i costs neither DMA nor VPU work —
                        # its logits are staged as -1e9, matching the mask
                        # the full-read path would apply (on average this
                        # halves the row-pattern attention arithmetic).
                        for c in range(n_chunks):
                            cs = c * chunk

                            @pl.when(cs < i)
                            def _(cs=cs):
                                lg = jnp.sum(
                                    _f32(k_hist[cs:cs + chunk])
                                    * jnp.expand_dims(q_s, 0),
                                    axis=1) * inv_sqrt_hd
                                logit_ref[cs:cs + chunk] = (
                                    lg * ks_h[cs:cs + chunk] if quant else lg)

                            @pl.when(cs >= i)
                            def _(cs=cs):
                                logit_ref[cs:cs + chunk] = jnp.full(
                                    (chunk, nh_t), neg, jnp.float32)
                        logits = jnp.where(row_ids < i, logit_ref[:], neg)
                        full = jnp.concatenate([logits, logit_cur], axis=0)
                        w = jax.nn.softmax(full, axis=0)    # (l+1, nh_t)
                        w_cur = jax.lax.slice_in_dim(
                            w, block_len, block_len + 1, axis=0)
                        acc_ref[:] = w_cur * v_s
                        for c in range(n_chunks):
                            cs = c * chunk

                            @pl.when(cs < i)
                            def _(cs=cs):
                                wc = jax.lax.slice_in_dim(
                                    w, cs, cs + chunk, axis=0)
                                if quant:
                                    wc = wc * vs_h[cs:cs + chunk]
                                acc_ref[:] += jnp.sum(
                                    jnp.expand_dims(wc, 1)
                                    * _f32(v_hist[cs:cs + chunk]), axis=0)
                        attn_t = acc_ref[:]
                    elif pattern == 0:
                        # row: history strictly below offset i; current appended.
                        logits = jnp.sum(
                            _f32(k_hist) * jnp.expand_dims(q_s, 0),
                            axis=1) * inv_sqrt_hd
                        if quant:
                            logits = logits * ks_h
                        logits = jnp.where(row_ids < i, logits, neg)
                        full = jnp.concatenate([logits, logit_cur], axis=0)
                        w = jax.nn.softmax(full, axis=0)    # (l+1, nh_t)
                        w_rows = jax.lax.slice_in_dim(w, 0, block_len, axis=0)
                        if quant:
                            w_rows = w_rows * vs_h
                        w_hist = jnp.expand_dims(w_rows, 1)
                        w_cur = jax.lax.slice_in_dim(w, block_len, block_len + 1, axis=0)
                        attn_t = (jnp.sum(w_hist * _f32(v_hist), axis=0)
                                  + w_cur * v_s)
                    else:
                        # prev_row: whole previous block, no current token; the
                        # uniform-over-zero-block b==0 case must output zero.
                        logits = jnp.sum(
                            _f32(k_hist) * jnp.expand_dims(q_s, 0),
                            axis=1) * inv_sqrt_hd
                        if quant:
                            logits = logits * ks_h
                        w = jax.nn.softmax(logits, axis=0)
                        if quant:
                            w = w * vs_h
                        attn_t = jnp.sum(jnp.expand_dims(w, 1) * _f32(v_hist),
                                         axis=0)
                        attn_t = attn_t * (b > 0).astype(attn_t.dtype)
                    # Slot consumed — refill it for job j+hist_slots.
                    if jidx + hist_slots < len(hist_jobs):
                        hist_start(jidx + hist_slots)
                    jidx += 1
                else:  # col: column i across all blocks (prefetched)
                    cslot = cidx % 2
                    for part in range(n_parts):
                        col_dma(cidx, part).wait()
                    k_hist = kcol_ref[cslot, :, 0]          # (blocks, hd, nh_t)
                    v_hist = vcol_ref[cslot, :, 0]
                    logits = jnp.sum(_f32(k_hist) * jnp.expand_dims(q_s, 0),
                                     axis=1) * inv_sqrt_hd
                    if quant:
                        logits = logits * kscol_ref[cslot, :, 0, 0].astype(
                            jnp.float32)
                    logits = jnp.where(blk_ids < b, logits, neg)
                    full = jnp.concatenate([logits, logit_cur], axis=0)
                    w = jax.nn.softmax(full, axis=0)        # (blocks+1, nh_t)
                    w_blk = jax.lax.slice_in_dim(w, 0, blocks, axis=0)
                    if quant:
                        w_blk = w_blk * vscol_ref[cslot, :, 0, 0].astype(
                            jnp.float32)
                    w_hist = jnp.expand_dims(w_blk, 1)
                    w_cur = jax.lax.slice_in_dim(w, blocks, blocks + 1, axis=0)
                    attn_t = (jnp.sum(w_hist * _f32(v_hist), axis=0)
                              + w_cur * v_s)
                    # This job's slot is consumed — refill it for job c+2.
                    if cidx + 2 < len(col_jobs):
                        col_start(cidx + 2)
                    cidx += 1
                attn_tiles.append(attn_t)

            attn = (attn_tiles[0] if lane_tiles == 1
                    else jnp.concatenate(attn_tiles, axis=1))
            attn_nh = from_lane_major(attn)                 # back to batch-major
            res1 = (jnp.dot(attn_nh, out_k_ref[li],
                            preferred_element_type=jnp.float32)
                    + out_b_ref[li])
            h = ln(x + res1, ln2s_ref[li], ln2b_ref[li])
            res2 = jnp.dot(h, mlp_k_ref[li],
                           preferred_element_type=jnp.float32) + mlp_b_ref[li]
            x = res2 + res1 + x

            # The current-token cache write overlapped the whole layer; any
            # race with a prefetched history read touches only masked entries.
            wk.wait()
            wv.wait()
            if quant:
                wks.wait()
                wvs.wait()

        if sample is None:
            x_out_ref[:] = x
            return

        # ---- fused sampling tail (head + sample + next-token embed) -------
        bins_p = sample["bins_p"]
        # head_k is pre-scaled by 1/temperature, head_b's padding is -1e9, so
        # argmax can never select a padded bin.
        scores = (jnp.dot(x, head_k_ref[:], preferred_element_type=jnp.float32)
                  + head_b_ref[0])
        if sample["mode"] == "top_k":
            # Exact k-th-largest threshold by int-bisection (no sort), then
            # mask to the top-k set — identical tie semantics to the XLA
            # path's sort-based kth (sample/decode.py:77-79) — and fall
            # through to Gumbel-max over the survivors.
            kth = kth_largest_threshold(scores, sample["top_k"])
            scores = jnp.where(scores < kth, jnp.float32(-1e9), scores)
        if sample["mode"] == "top_p":
            # Nucleus cutoff by probability-mass bisection (no sort) — same
            # keep-set as the XLA sort+cumsum path (sample/decode.py:80-91),
            # then Gumbel-max over the survivors.  Padding bins sit at -1e9
            # so their softmax mass underflows to exactly 0.
            cut = top_p_cutoff_threshold(scores, sample["top_p"])
            scores = jnp.where(scores < cut, jnp.float32(-1e9), scores)
        if sample["mode"] in ("gumbel", "top_k", "top_p"):
            bits = pltpu.bitcast(pltpu.prng_random_bits(scores.shape),
                                 jnp.uint32)
            # top 24 bits -> u in (0, 1); Mosaic lacks uint32->f32, but after
            # the shift the value fits int32 exactly.
            u = (pltpu.bitcast(bits >> 8, jnp.int32).astype(jnp.float32)
                 * (1.0 / (1 << 24)) + 1e-12)
            scores = scores - jnp.log(-jnp.log(u))
        tok = jnp.argmax(scores, axis=-1).astype(jnp.int32)      # (N,)
        tok_ref[0, :] = tok
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (n, bins_p), 1)
                  == tok[:, None]).astype(jnp.float32)
        # Exact embedding gather as a one-hot matmul (emb pre-scaled by
        # sqrt(d)); HIGHEST precision makes it bit-exact vs jnp.take.
        x_emb = jax.lax.dot_general(
            onehot, emb_ref[:], (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
        stream_dma.wait()
        # (n_stream, width) with n_stream in {1, n}: broadcasting covers both.
        x_out_ref[:] = x_emb + stream_scratch[0]

    return kernel


def _auto_lane_tiles(nh: int, block_len: int, hd: int, cache_bytes: int,
                     blocks: int, hist_slots: int = HIST_SLOTS,
                     scale_bytes: int = 0) -> int:
    """Smallest tiling keeping the lane-tiled scratch buffers (khist/vhist of
    (hist_slots, block_len, hd, nh_t) plus double-buffered kcol/vcol of
    (blocks, hd, nh_t), plus the int8 path's scale slabs when
    ``scale_bytes > 0``) within ~8MB of the 16MB scoped-VMEM budget.  The
    staging buffers are NOT tiled but are block_len-fold smaller."""
    budget = 8 * 1024 * 1024

    def scratch(tiles):
        return ((2 * hist_slots * block_len + 4 * blocks)
                * (hd * cache_bytes + scale_bytes) * (nh // tiles))

    # Smallest tile count that divides nh into 128-lane-aligned tiles and
    # fits the budget (e.g. nh=384 -> 3 tiles of 128; a power-of-2-only
    # search would leave it untiled and blow scoped VMEM).
    candidates = [t for t in range(1, nh // LANE + 1)
                  if nh % t == 0 and (nh // t) % LANE == 0]
    for tiles in candidates:
        if scratch(tiles) <= budget:
            return tiles
    return candidates[-1] if candidates else 1


def decode_cache_lane_tiles(nh: int, block_len: int, hd: int,
                            cache_dtype, blocks: int,
                            hist_slots: int = HIST_SLOTS) -> int:
    """Lane-tile count the fused kernel will use for this geometry (the
    VMEM-bounded auto choice).  The KV caches must be allocated tile-major
    with exactly this count — see decode_cache_shape."""
    dt = jnp.dtype(cache_dtype)
    scale_bytes = (jnp.dtype(SCALE_DTYPE).itemsize
                   if dt == jnp.dtype(jnp.int8) else 0)
    return _auto_lane_tiles(nh, block_len, hd, dt.itemsize, blocks,
                            hist_slots, scale_bytes=scale_bytes)


def decode_cache_shape(depth: int, blocks: int, block_len: int, hd: int,
                       nh: int, lane_tiles: int):
    """Tile-major KV-cache shape: (depth, lane_tiles, blocks, block_len, hd,
    nh_t).  Each (layer, tile) slab is contiguous in HBM so every history
    DMA runs at full burst efficiency regardless of the tiling."""
    assert nh % lane_tiles == 0
    return (depth, lane_tiles, blocks, block_len, hd, nh // lane_tiles)


def decode_scale_cache_shape(depth: int, blocks: int, block_len: int,
                             nh: int, lane_tiles: int):
    """Side-cache shape for the int8 path's per-(position, lane) scales:
    the value-cache layout with the hd axis collapsed to 1 (scales are
    constant along hd — they factor out of the attention reductions)."""
    assert nh % lane_tiles == 0
    return (depth, lane_tiles, blocks, block_len, 1, nh // lane_tiles)


def tile_cache(cache: jnp.ndarray, lane_tiles: int) -> jnp.ndarray:
    """(depth, blocks, block_len, hd, nh) -> tile-major 6-D layout.
    Test/porting helper; production code allocates tile-major directly."""
    d, b, l, hd_, nh = cache.shape
    split = cache.reshape(d, b, l, hd_, lane_tiles, nh // lane_tiles)
    return jnp.transpose(split, (0, 4, 1, 2, 3, 5))


def untile_cache(cache: jnp.ndarray) -> jnp.ndarray:
    """Inverse of tile_cache: tile-major 6-D -> (depth, blocks, block_len,
    hd, nh)."""
    d, t, b, l, hd_, nh_t = cache.shape
    return jnp.transpose(cache, (0, 2, 3, 4, 1, 5)).reshape(
        d, b, l, hd_, t * nh_t)


@functools.partial(
    jax.jit,
    static_argnames=("depth", "n", "heads", "hd", "width", "blocks",
                     "block_len", "patterns", "interpret", "lane_tiles",
                     "hist_slots"))
def fused_decode_step(
    scalars: jnp.ndarray,   # (1, 1) int32: [t] (b, i derived in-kernel)
    x: jnp.ndarray,         # (N, width) f32
    uc: jnp.ndarray,        # (depth, N, 2, width) f32
    kc: jnp.ndarray,        # (depth, lane_tiles, blocks, block_len, hd, nh_t)
    vc: jnp.ndarray,        #   f32 / bf16 / int8 — see decode_cache_shape
    weights: Tuple[jnp.ndarray, ...],
    *,
    kscale=None,            # int8 caches only: per-(position, lane) scales,
    vscale=None,            #   see decode_scale_cache_shape
    depth: int, n: int, heads: int, hd: int, width: int,
    blocks: int, block_len: int, patterns: Tuple[int, ...],
    interpret=False,        # False | True | "tpu" (see _interp)
    lane_tiles: int = 0,    # 0 = infer from the cache's tile dim
    hist_slots: int = HIST_SLOTS,  # history-read pipeline depth
):
    """Runs one full decode step. Returns (x_out, uc, kc, vc[, ks, vs]) with
    caches updated in place (aliased)."""
    nh = n * heads
    cache_dtype = kc.dtype
    quant = jnp.dtype(cache_dtype) == jnp.dtype(jnp.int8)
    assert quant == (kscale is not None) == (vscale is not None), (
        "int8 caches need kscale/vscale side caches (and only int8 does)")
    if not interpret:
        assert nh % LANE == 0, (
            f"fused decode needs batch*heads % {LANE} == 0, got {nh}")
    assert kc.ndim == 6, "caches are tile-major — use decode_cache_shape"
    if lane_tiles == 0:
        lane_tiles = kc.shape[1]
    assert kc.shape[1] == lane_tiles and nh % lane_tiles == 0
    nh_t = nh // lane_tiles
    n_parts = 4 if quant else 2
    kernel = _make_kernel(depth, n, heads, hd, width, blocks, block_len,
                          patterns, cache_dtype=cache_dtype,
                          lane_tiles=lane_tiles, hist_slots=hist_slots)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    scale_args = [kscale, vscale] if quant else []
    scale_specs = [any_spec] * len(scale_args)
    scale_shapes = [jax.ShapeDtypeStruct(s.shape, s.dtype)
                    for s in scale_args]
    scale_scratch = ([
        pltpu.VMEM((hist_slots, block_len, 1, nh_t), SCALE_DTYPE),  # kshist
        pltpu.VMEM((hist_slots, block_len, 1, nh_t), SCALE_DTYPE),  # vshist
    ] if quant else [])
    scale_col_scratch = ([
        pltpu.VMEM((2, blocks, 1, 1, nh_t), SCALE_DTYPE),   # kscol
        pltpu.VMEM((2, blocks, 1, 1, nh_t), SCALE_DTYPE),   # vscol
    ] if quant else [])
    scale_staging = ([
        pltpu.VMEM((lane_tiles, 1, 1, 1, nh_t), SCALE_DTYPE),  # ks staging
        pltpu.VMEM((lane_tiles, 1, 1, 1, nh_t), SCALE_DTYPE),  # vs staging
    ] if quant else [])
    # uc/kc/vc(/ks/vs) are updated in place: input j -> output j-1.
    aliases = {j: j - 1 for j in range(2, 5 + len(scale_args))}

    out = pl.pallas_call(
        kernel,
        in_specs=([smem, vmem, vmem, any_spec, any_spec] + scale_specs
                  + [vmem] * 10),
        out_specs=[vmem, vmem, any_spec, any_spec] + scale_specs,
        out_shape=[
            jax.ShapeDtypeStruct((n, width), jnp.float32),
            jax.ShapeDtypeStruct(uc.shape, jnp.float32),
            jax.ShapeDtypeStruct(kc.shape, cache_dtype),
            jax.ShapeDtypeStruct(vc.shape, cache_dtype),
        ] + scale_shapes,
        input_output_aliases=aliases,
        scratch_shapes=[
            pltpu.VMEM((hist_slots, block_len, hd, nh_t), cache_dtype),  # khist
            pltpu.VMEM((hist_slots, block_len, hd, nh_t), cache_dtype),  # vhist
        ] + scale_scratch + [
            pltpu.VMEM((2, blocks, 1, hd, nh_t), cache_dtype),  # kcol (2 slots)
            pltpu.VMEM((2, blocks, 1, hd, nh_t), cache_dtype),  # vcol (2 slots)
        ] + scale_col_scratch + [
            pltpu.VMEM((lane_tiles, 1, 1, hd, nh_t), cache_dtype),  # kt staging
            pltpu.VMEM((lane_tiles, 1, 1, hd, nh_t), cache_dtype),  # vt staging
        ] + scale_staging + [
            pltpu.VMEM((block_len, nh_t), jnp.float32),        # row logits
            pltpu.VMEM((hd, nh_t), jnp.float32),               # row attn acc
            pltpu.SemaphoreType.DMA((hist_slots, n_parts, 4)),  # hist chunk sems
            pltpu.SemaphoreType.DMA((2, n_parts)),             # col slot sems
            pltpu.SemaphoreType.DMA((1,)),                     # stream sem
            pltpu.SemaphoreType.DMA((depth, n_parts)),         # write sems
        ],
        interpret=_interp(interpret),
        compiler_params=(pltpu.CompilerParams(
            has_side_effects=True,
            # Raise the compiler's 16 MiB scoped-VMEM ceiling ONLY for wide
            # geometries: width 512 needs 16.2 MiB for the per-layer MLP
            # weight stages and is rejected outright at the default, while
            # v5e has 128 MiB of physical VMEM.  The raise is gated on
            # width because a larger budget changes Mosaic's scheduling for
            # kernels that DID fit: the flagship width-128 decode measured
            # 41.7 -> 51.2 us/step under a blanket 64 MiB limit (r3 A/B).
            vmem_limit_bytes=(64 * 1024 * 1024 if width >= 256 else None),
        ) if _HAS_PLTPU and not interpret else None),
    )(scalars, x, uc, kc, vc, *scale_args, *weights)
    return out


def _interp(interpret):
    """False / True (generic interpreter) / "tpu" (TPU interpreter — needed
    when interpreting kernels that use the hardware PRNG)."""
    if interpret == "tpu":
        return pltpu.InterpretParams()
    return bool(interpret)


@functools.partial(
    jax.jit,
    static_argnames=("depth", "n", "heads", "hd", "width", "blocks",
                     "block_len", "patterns", "mode", "top_k", "top_p",
                     "interpret", "lane_tiles", "hist_slots"))
def fused_decode_step_sample(
    scalars: jnp.ndarray,   # (1, 1) int32: [t] (b, i derived in-kernel)
    seeds: jnp.ndarray,     # (1, 2) int32 PRNG seeds (scan-invariant)
    x: jnp.ndarray,         # (N, width) f32 — position t's input embedding
    uc: jnp.ndarray,        # (depth, N, 2, width) f32
    kc: jnp.ndarray,        # (depth, lane_tiles, blocks, block_len, hd, nh_t)
    vc: jnp.ndarray,        #   f32 / bf16 / int8 — see decode_cache_shape
    weights: Tuple[jnp.ndarray, ...],
    head_k: jnp.ndarray,    # (width, bins_p) f32, pre-scaled by 1/temperature
    head_b: jnp.ndarray,    # (1, bins_p) f32, padding bins at -1e9
    emb: jnp.ndarray,       # (bins_p, width) f32, pre-scaled by sqrt(width)
    stream: jnp.ndarray,    # (ctx+1, n_stream, width) f32: pos (+ x_cond)
    *,
    kscale=None,            # int8 caches only: per-(position, lane) scales,
    vscale=None,            #   see decode_scale_cache_shape
    depth: int, n: int, heads: int, hd: int, width: int,
    blocks: int, block_len: int, patterns: Tuple[int, ...],
    mode: str = "gumbel",   # 'gumbel' | 'greedy' | 'top_k' | 'top_p'
    top_k: int = 0,         # for mode='top_k': sample among the k best bins
    top_p: float = 1.0,     # for mode='top_p': sample within the nucleus
    interpret=False,        # False | True | "tpu" (see _interp)
    lane_tiles: int = 0,
    hist_slots: int = HIST_SLOTS,  # history-read pipeline depth
):
    """One COMPLETE autoregressive step: transformer layers + logits head +
    token sampling + next-position input embedding, in a single kernel.

    Returns (x_next, tok (1, N) int32, uc, kc, vc[, ks, vs]); caches aliased
    in place.  The lax.scan body around this is just integer bookkeeping —
    the XLA path issues the head matmul, threefry sampling, and embedding
    gather as separate per-step HLOs whose dispatch dominates small-model
    decode.
    """
    nh = n * heads
    cache_dtype = kc.dtype
    quant = jnp.dtype(cache_dtype) == jnp.dtype(jnp.int8)
    assert quant == (kscale is not None) == (vscale is not None), (
        "int8 caches need kscale/vscale side caches (and only int8 does)")
    bins_p = head_k.shape[1]
    assert bins_p % LANE == 0 and emb.shape == (bins_p, width)
    if not interpret:
        assert nh % LANE == 0, (
            f"fused decode needs batch*heads % {LANE} == 0, got {nh}")
        assert width % LANE == 0, (
            f"the sampled kernel's stream DMA needs width % {LANE} == 0, "
            f"got {width} (use sample_in_kernel=False for narrower models)")
    assert kc.ndim == 6, "caches are tile-major — use decode_cache_shape"
    if lane_tiles == 0:
        lane_tiles = kc.shape[1]
    assert kc.shape[1] == lane_tiles and nh % lane_tiles == 0
    nh_t = nh // lane_tiles
    n_parts = 4 if quant else 2
    n_stream = stream.shape[1]
    kernel = _make_kernel(depth, n, heads, hd, width, blocks, block_len,
                          patterns, cache_dtype=cache_dtype,
                          lane_tiles=lane_tiles, hist_slots=hist_slots,
                          sample={"mode": mode, "bins_p": bins_p,
                                  "n_stream": n_stream, "top_k": top_k,
                                  "top_p": top_p})
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    scale_args = [kscale, vscale] if quant else []
    scale_specs = [any_spec] * len(scale_args)
    scale_shapes = [jax.ShapeDtypeStruct(s.shape, s.dtype)
                    for s in scale_args]
    scale_scratch = ([
        pltpu.VMEM((hist_slots, block_len, 1, nh_t), SCALE_DTYPE),  # kshist
        pltpu.VMEM((hist_slots, block_len, 1, nh_t), SCALE_DTYPE),  # vshist
    ] if quant else [])
    scale_col_scratch = ([
        pltpu.VMEM((2, blocks, 1, 1, nh_t), SCALE_DTYPE),   # kscol
        pltpu.VMEM((2, blocks, 1, 1, nh_t), SCALE_DTYPE),   # vscol
    ] if quant else [])
    scale_staging = ([
        pltpu.VMEM((lane_tiles, 1, 1, 1, nh_t), SCALE_DTYPE),  # ks staging
        pltpu.VMEM((lane_tiles, 1, 1, 1, nh_t), SCALE_DTYPE),  # vs staging
    ] if quant else [])
    # uc/kc/vc(/ks/vs) in place: input j (after scalars/seeds/x) -> output j-1.
    aliases = {j: j - 1 for j in range(3, 6 + len(scale_args))}

    out = pl.pallas_call(
        kernel,
        in_specs=([smem, smem, vmem, vmem, any_spec, any_spec] + scale_specs
                  + [vmem] * 10 + [vmem, vmem, vmem, any_spec]),
        out_specs=[vmem, vmem, vmem, any_spec, any_spec] + scale_specs,
        out_shape=[
            jax.ShapeDtypeStruct((n, width), jnp.float32),   # x_next
            jax.ShapeDtypeStruct((1, n), jnp.int32),         # sampled tokens
            jax.ShapeDtypeStruct(uc.shape, jnp.float32),
            jax.ShapeDtypeStruct(kc.shape, cache_dtype),
            jax.ShapeDtypeStruct(vc.shape, cache_dtype),
        ] + scale_shapes,
        input_output_aliases=aliases,
        scratch_shapes=[
            pltpu.VMEM((hist_slots, block_len, hd, nh_t), cache_dtype),  # khist
            pltpu.VMEM((hist_slots, block_len, hd, nh_t), cache_dtype),  # vhist
        ] + scale_scratch + [
            pltpu.VMEM((2, blocks, 1, hd, nh_t), cache_dtype),  # kcol (2 slots)
            pltpu.VMEM((2, blocks, 1, hd, nh_t), cache_dtype),  # vcol (2 slots)
        ] + scale_col_scratch + [
            pltpu.VMEM((lane_tiles, 1, 1, hd, nh_t), cache_dtype),  # kt staging
            pltpu.VMEM((lane_tiles, 1, 1, hd, nh_t), cache_dtype),  # vt staging
        ] + scale_staging + [
            pltpu.VMEM((1, n_stream, width), jnp.float32),     # stream slice
            pltpu.VMEM((block_len, nh_t), jnp.float32),        # row logits
            pltpu.VMEM((hd, nh_t), jnp.float32),               # row attn acc
            pltpu.SemaphoreType.DMA((hist_slots, n_parts, 4)),  # hist chunk sems
            pltpu.SemaphoreType.DMA((2, n_parts)),             # col slot sems
            pltpu.SemaphoreType.DMA((1,)),                     # stream sem
            pltpu.SemaphoreType.DMA((depth, n_parts)),         # write sems
        ],
        interpret=_interp(interpret),
        compiler_params=(pltpu.CompilerParams(
            has_side_effects=True,
            # Raise the compiler's 16 MiB scoped-VMEM ceiling ONLY for wide
            # geometries: width 512 needs 16.2 MiB for the per-layer MLP
            # weight stages and is rejected outright at the default, while
            # v5e has 128 MiB of physical VMEM.  The raise is gated on
            # width because a larger budget changes Mosaic's scheduling for
            # kernels that DID fit: the flagship width-128 decode measured
            # 41.7 -> 51.2 us/step under a blanket 64 MiB limit (r3 A/B).
            vmem_limit_bytes=(64 * 1024 * 1024 if width >= 256 else None),
        ) if _HAS_PLTPU and not interpret else None),
    )(scalars, seeds, x, uc, kc, vc, *scale_args, *weights,
      head_k, head_b, emb, stream)
    return out
