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
  * each grid cell DMAs its ``(bn, bt + 2H, C)`` tile from HBM (overlapping
    reads — BlockSpec indexing cannot overlap, so the input stays in ANY
    memory and the kernel issues the sliced copy itself);
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


def _taps_matmul(h, w_flat, bias, d, acc_dtype=jnp.float32):
    """k=3 SAME dilated conv on a tile as ONE (M, 3C) x (3C, C) matmul.

    Tile-edge shift fills are zeros — wrong values, but they live inside the
    halo margin that the caller discards.
    """
    tlen = h.shape[1]

    def shift(off):
        if off == 0:
            return h
        if off < 0:
            return jnp.pad(h, ((0, 0), (-off, 0), (0, 0)))[:, :tlen]
        return jnp.pad(h, ((0, 0), (0, off), (0, 0)))[:, off:]

    cat = jnp.concatenate([shift(-d), shift(0), shift(d)], axis=-1)
    out = jax.lax.dot_general(
        cat, w_flat, (((2,), (0,)), ((), ())),
        preferred_element_type=acc_dtype)
    return out + bias.astype(acc_dtype)


def _resnet_kernel(x_hbm, w0, b0, w1, b1, out_ref, tile, sem, *,
                   dilations, halo, block_t, t_global, compute_dtype):
    i = pl.program_id(0)
    j = pl.program_id(1)
    bn = tile.shape[0]

    # Overlapping tile read: [j*bt, j*bt + bt + 2H) of the H-pre-padded input.
    dma = pltpu.make_async_copy(
        x_hbm.at[pl.ds(i * bn, bn), pl.ds(j * block_t, block_t + 2 * halo), :],
        tile, sem)
    dma.start()
    dma.wait()

    # Positions beyond the GLOBAL edge must stay exactly zero between blocks
    # (module docstring).  pos is the unpadded global time index.
    pos = jax.lax.broadcasted_iota(
        jnp.int32, (1, block_t + 2 * halo, 1), 1) + (j * block_t - halo)
    inside = jnp.logical_and(pos >= 0, pos < t_global)

    cur = tile[:].astype(compute_dtype)
    for l, d in enumerate(dilations):
        h = jnp.maximum(cur, 0.0)
        y = _taps_matmul(h, w0[l].reshape(-1, w0.shape[-1]).astype(compute_dtype),
                         b0[l], d)
        # Conv_1's SAME padding reads ZEROS beyond the global edge, not
        # Conv_0's bias ripple — mask the intermediate too (cur is already
        # masked, so relu(cur) is safe for Conv_0).
        h2 = jnp.where(inside, jnp.maximum(y, 0.0), 0.0).astype(compute_dtype)
        y2 = _taps_matmul(h2, w1[l].reshape(-1, w1.shape[-1]).astype(compute_dtype),
                          b1[l], 1)
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
        bt = min(t, 2048)
        while t % bt:
            bt -= 1
    assert t % bt == 0 and n % bn == 0

    xp = jnp.pad(x, ((0, 0), (halo, halo), (0, 0)))
    kernel = functools.partial(
        _resnet_kernel, dilations=dilations, halo=halo, block_t=bt,
        t_global=t, compute_dtype=compute_dtype)

    flops = 2 * n * t * (3 * c) * c * 2 * len(dilations)
    bytes_accessed = 2 * n * t * c * x.dtype.itemsize + 4 * w0.size * 4

    return pl.pallas_call(
        kernel,
        grid=(n // bn, t // bt),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),    # padded input (HBM)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # w0 (whole)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # b0
            pl.BlockSpec(memory_space=pltpu.VMEM),   # w1
            pl.BlockSpec(memory_space=pltpu.VMEM),   # b1
        ],
        out_specs=pl.BlockSpec((bn, bt, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, t, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((bn, bt + 2 * halo, c), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0),
        interpret=interpret,
    )(xp, w0, b0, w1, b1)


def resnet_pallas_available() -> bool:
    return jax.default_backend() == "tpu"


def fused_resnet_from_flax(x, params: dict, depth: int,
                           dilations: Sequence[int], **kw) -> jnp.ndarray:
    """Convenience: run the kernel straight off a flax DilatedResnet1D
    param subtree (checkpoint-compatible — stack_resnet_params only
    restacks, never reinterprets, the Conv kernels)."""
    w0, b0, w1, b1 = stack_resnet_params(params, depth)
    return fused_dilated_resnet(x, w0, b0, w1, b1, dilations, **kw)
