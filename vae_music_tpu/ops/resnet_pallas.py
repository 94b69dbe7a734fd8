"""Fused dilated-resnet stack as one Pallas kernel (SURVEY.md §7 stage 3b).

A ``DilatedResnet1D`` stack (nn/resnet.py, mirroring /root/reference/
resnet.py:40-59) is ``L`` blocks of ``x + Conv1(relu(Conv0(relu(x))))`` with
Conv0 dilated (k=3, SAME).  At the VQ decoder's serving widths (C=32) every
conv is HBM-bound: XLA materialises the (N, T, C) activation between convs,
so a depth-4 stack moves ~8 round trips of the stream per stage
(docs/SERVING.md budget: 11.10 ms of the 51.4 ms chain in these stacks).

This kernel runs the WHOLE stack on a VMEM-resident tile: one HBM read and
one write per stack instead of ~8.  The classic halo trick makes the chain
tile-local:

  * the input is pre-padded by ``H = sum(d_l + 1)`` zeros per side (the
    cumulative receptive-field growth of the chain);
  * XLA pre-gathers the overlapping ``(bn, bt + 2H, C)`` windows into an
    ``(n, T/bt, bt + 2H, C)`` array of static slices so each grid cell reads
    a disjoint block through a normal pipelined BlockSpec.  (BlockSpec
    indexing cannot overlap; a manual in-kernel DMA from ``pl.ANY`` memory
    can, but Mosaic requires HBM slice shapes lane-aligned to 128 and C=32 —
    the window copy costs one extra ~1.1x HBM round trip of the input and
    keeps the kernel on the supported path);
  * every block computes on the full tile; correctness decays inward by
    ``d_l + 1`` per block, so after all L blocks the central ``bt`` region is
    exactly the global result and is the only part written back;
  * positions beyond the GLOBAL signal edge are re-zeroed after every block
    (SAME-conv zero padding applies per conv; without the mask, block l+1
    would read block l's bias ripple where the reference reads zeros);
  * convs are computed as tap-concatenated matmuls: (M, 3C) x (3C, C), the
    largest contraction this width allows on the MXU.

All 4L conv weights (~100 KB at C=32) live in VMEM for the whole call.

Measured win-or-lose on the serving geometry is recorded in docs/SERVING.md
(scripts/resnet_lab.py) exactly like the flash/taps notes.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def stack_resnet_params(params: dict, depth: int):
    """Flax ``DilatedResnet1D`` params -> (w0, b0, w1, b1) stacks.

    w0/w1: (L, 3, C, C); b0/b1: (L, C).  Block ``l`` is
    ``ResnetConv1DBlock_l`` with Conv_0 (dilated) and Conv_1 (d=1).
    """
    w0 = jnp.stack([params[f"ResnetConv1DBlock_{i}"]["Conv_0"]["kernel"]
                    for i in range(depth)])
    b0 = jnp.stack([params[f"ResnetConv1DBlock_{i}"]["Conv_0"]["bias"]
                    for i in range(depth)])
    w1 = jnp.stack([params[f"ResnetConv1DBlock_{i}"]["Conv_1"]["kernel"]
                    for i in range(depth)])
    b1 = jnp.stack([params[f"ResnetConv1DBlock_{i}"]["Conv_1"]["bias"]
                    for i in range(depth)])
    return w0, b0, w1, b1


def _taps_matmul(h, w_taps, bias, d, acc_dtype=jnp.float32):
    """k=3 SAME dilated conv on a tile as THREE (M, C) x (C, C) matmuls.

    Tile-edge shift fills are zeros — wrong values, but they live inside the
    halo margin that the caller discards.

    Summing per-tap matmuls (instead of one (M, 3C) x (3C, C) on the
    lane-concatenated taps) is a Mosaic constraint, not a choice: the
    pad-then-slice shifts give the operands sublane-offset layouts that
    ``tpu.concatenate`` rejects ("result/input offset mismatch on non-concat
    dimension"), and ``pltpu.roll`` lowers to ``tpu.dynamic_rotate`` which
    has no bf16 path.  Matmul operands, by contrast, Mosaic relayouts
    freely.  MXU cost is identical anyway: K=32 and K=96 both pad to the
    128-wide systolic contraction.
    """
    tlen = h.shape[1]

    def shift(off):
        if off == 0:
            return h
        if off < 0:
            return jnp.pad(h, ((0, 0), (-off, 0), (0, 0)))[:, :tlen]
        return jnp.pad(h, ((0, 0), (0, off), (0, 0)))[:, off:]

    out = bias.astype(acc_dtype)
    for k, off in enumerate((-d, 0, d)):
        out = out + jax.lax.dot_general(
            shift(off), w_taps[k], (((2,), (0,)), ((), ())),
            preferred_element_type=acc_dtype)
    return out


def _resnet_kernel(x_ref, w0, b0, w1, b1, out_ref, *,
                   dilations, halo, block_t, t_global, compute_dtype):
    j = pl.program_id(1)

    # Positions beyond the GLOBAL edge must stay exactly zero between blocks
    # (module docstring).  pos is the unpadded global time index.
    pos = jax.lax.broadcasted_iota(
        jnp.int32, (1, block_t + 2 * halo, 1), 1) + (j * block_t - halo)
    inside = jnp.logical_and(pos >= 0, pos < t_global)

    cur = x_ref[:, 0].astype(compute_dtype)
    for l, d in enumerate(dilations):
        h = jnp.maximum(cur, 0.0)
        y = _taps_matmul(h, w0[l].astype(compute_dtype), b0[l], d)
        # Conv_1's SAME padding reads ZEROS beyond the global edge, not
        # Conv_0's bias ripple — mask the intermediate too (cur is already
        # masked, so relu(cur) is safe for Conv_0).
        h2 = jnp.where(inside, jnp.maximum(y, 0.0), 0.0).astype(compute_dtype)
        y2 = _taps_matmul(h2, w1[l].astype(compute_dtype), b1[l], 1)
        cur = jnp.where(inside, cur + y2.astype(compute_dtype), 0.0)

    out_ref[:] = cur[:, halo:halo + block_t, :].astype(out_ref.dtype)


def fused_dilated_resnet(
    x: jnp.ndarray,
    w0: jnp.ndarray, b0: jnp.ndarray, w1: jnp.ndarray, b1: jnp.ndarray,
    dilations: Sequence[int],
    *,
    block_n: int = 16,
    block_t: int = 0,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """Apply the whole ``DilatedResnet1D`` stack in one Pallas kernel.

    x: (N, T, C); w0/w1: (L, 3, C, C); b0/b1: (L, C).  Returns (N, T, C) in
    ``x.dtype``.  ``block_t=0`` auto-picks the largest divisor of T at or
    under 2048.
    """
    n, t, c = x.shape
    dilations = tuple(int(d) for d in dilations)
    halo = sum(d + 1 for d in dilations)

    bn = min(block_n, n)
    while n % bn:
        bn -= 1
    bt = block_t
    if bt == 0:
        # VMEM-aware: the live f32 intermediates scale with bn*bt*c, so cap
        # bt inversely with width (2048 at the flagship C=32 fits 96 MiB).
        bt = min(t, max(256, 2048 * 32 // c))
        while t % bt:
            bt -= 1
    assert t % bt == 0 and n % bn == 0

    xp = jnp.pad(x, ((0, 0), (halo, halo), (0, 0)))
    # Overlapping halo windows as static slices (XLA fuses these into one
    # copy): xov[:, j] = xp[:, j*bt : j*bt + bt + 2H].
    xov = jnp.stack(
        [jax.lax.dynamic_slice_in_dim(xp, j * bt, bt + 2 * halo, axis=1)
         for j in range(t // bt)], axis=1)

    kernel = functools.partial(
        _resnet_kernel, dilations=dilations, halo=halo, block_t=bt,
        t_global=t, compute_dtype=compute_dtype)

    flops = 2 * n * t * (3 * c) * c * 2 * len(dilations)
    # Input traffic includes the xov halo-window gather (advisor r4): the
    # pre-gathered overlapping windows read AND re-write the input stream
    # once more, inflated by the 2*halo/bt overlap share, before the kernel
    # reads the windows and writes the output.
    # read xp + write out (1 each) plus write xov + kernel-read xov
    # (1 + 2*halo/bt each, the window overlap share).
    xov_factor = 1.0 + 2.0 * halo / bt
    bytes_accessed = int(
        n * t * c * x.dtype.itemsize * (2 + 2 * xov_factor)
        + 4 * w0.size * 4)

    return pl.pallas_call(
        kernel,
        grid=(n // bn, t // bt),
        in_specs=[
            pl.BlockSpec((bn, 1, bt + 2 * halo, c), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),    # halo windows
            pl.BlockSpec(memory_space=pltpu.VMEM),   # w0 (whole)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # b0
            pl.BlockSpec(memory_space=pltpu.VMEM),   # w1
            pl.BlockSpec(memory_space=pltpu.VMEM),   # b1
        ],
        out_specs=pl.BlockSpec((bn, bt, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, t, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            # The unrolled L-block chain keeps several (bn, bt+2H, C) f32
            # intermediates live at once; Mosaic's default 16 MiB scoped-VMEM
            # ceiling rejects that at bn=16, bt~2048 (measured: 31.7 MiB).
            vmem_limit_bytes=96 * 2**20,
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0),
        interpret=interpret,
    )(xov, w0, b0, w1, b1)


def resnet_pallas_available() -> bool:
    return jax.default_backend() == "tpu"


def fused_resnet_from_flax(x, params: dict, depth: int,
                           dilations: Sequence[int], **kw) -> jnp.ndarray:
    """Convenience: run the kernel straight off a flax DilatedResnet1D
    param subtree (checkpoint-compatible — stack_resnet_params only
    restacks, never reinterprets, the Conv kernels)."""
    w0, b0, w1, b1 = stack_resnet_params(params, depth)
    return fused_dilated_resnet(x, w0, b0, w1, b1, dilations, **kw)
