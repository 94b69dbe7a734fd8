"""Fused VQ codebook kernel (Pallas/TPU).

Fuses the codebook hot path of /root/reference/VectorQuantizer.py:75-131 into
one VMEM-resident pass per input tile:

    scores   = z @ E                    (MXU)
    dist     = |e_k|^2 - 2*scores       (VPU; |z|^2 is constant in k)
    codes    = argmin_k dist            (VPU)
    [m | n]  = [z | 1]^T @ onehot       (MXU — EMA cluster sums AND counts in
                                         one matmul; the ones-column makes the
                                         count row ride the same MXU pass)
    quant    = E^T[codes]               (XLA gather OUTSIDE the kernel — exact,
                                         and dead-code-eliminated when unused)

The codebook (D=64, K=512 -> 128 KB) stays in VMEM across all grid steps; the
(N, K) distance matrix never touches HBM.  EMA partials are accumulated across
grid steps into a single VMEM block.  Padded rows (when N is not a tile
multiple) are masked out of the statistics *inside* the kernel.

Round-3 measured honesty (scripts/vq_kernel_lab.py, v5e, flagship encode
shape (28672, 64) x (64, 512), on-device fori_loop timing — min over reps):

    XLA fused path (nearest_code + take + onehot matmuls)   ~588-618 us
    this kernel (several tile sizes / argmin strategies)    ~585-740 us

The hot cost at this shape is the VPU argmin over the (N, 512) distance
matrix, which XLA's own fusion already handles at the same speed; the MXU
matmuls are a minority of the time (a bf16-scores variant measured within
noise of f32).  The kernel therefore does NOT beat XLA single-chip and
``quantize(use_pallas=None)`` routes single-chip programs through the jnp
path (SURVEY.md §7 stage 3: "keep whichever wins per shape").  The kernel
remains the production path under ``shard_map`` (fused_vq_assign_sharded),
where it avoids GSPMD replicating the assignment, and is available
explicitly via ``use_pallas=True``.

The jnp reference implementation lives in vae_music_tpu.nn.quantizer;
tests compare both paths bit-for-bit (argmin tie-breaking included) in
interpret mode on CPU.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.7 promotes shard_map out of experimental
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

try:  # pallas TPU backend
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

# Sublane-aligned width of the ones-block appended to z so the EMA count row
# rides the m matmul (any of the 8 identical rows carries n).
_ONES = 8


def vq_pallas_available() -> bool:
    # Mosaic kernels lower on TPU only; a single-GPU (cuda/rocm) or CPU
    # backend must take the jnp path (ADVICE r2: auto-dispatch previously
    # tried to lower the TPU kernel on gpu backends).
    return _HAS_PLTPU and jax.default_backend() not in (
        "cpu", "gpu", "cuda", "rocm")


def _assign_kernel(n_rows, flat_ref, emb_ref, e2_ref, codes_ref, mn_ref):
    i = pl.program_id(0)
    tile = flat_ref.shape[0]

    z = flat_ref[:]                       # (TILE, D)
    scores = jnp.dot(z, emb_ref[:], preferred_element_type=jnp.float32)
    dist = e2_ref[:] - 2.0 * scores       # (TILE, K)
    codes = jnp.argmin(dist, axis=1).astype(jnp.int32)
    codes_ref[:] = codes[:, None]

    onehot = (jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
              == codes[:, None]).astype(jnp.float32)   # (TILE, K)
    if n_rows % tile != 0:
        # Mask padded rows out of the statistics (last grid step only).
        row = (i * tile
               + jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0))
        onehot = jnp.where(row < n_rows, onehot, 0.0)

    za = jnp.concatenate(
        [z, jnp.ones((tile, _ONES), jnp.float32)], axis=1)  # (TILE, D+8)
    mn_tile = jnp.dot(za.T, onehot, preferred_element_type=jnp.float32)

    @pl.when(i == 0)
    def _():
        mn_ref[:] = mn_tile

    @pl.when(i > 0)
    def _():
        mn_ref[:] += mn_tile


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def fused_vq_assign(
    flat: jnp.ndarray,        # (N, D) float32 encoder outputs
    embeddings: jnp.ndarray,  # (D, K) float32 codebook
    *,
    tile: int = 512,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (codes (N,), quantized (N, D), m_batch (D, K), n_batch (K,)).

    Pure assignment + statistics (no gradient path; callers wrap with the
    straight-through estimator).  Pads N up to a tile multiple; padded rows
    are masked out of the statistics inside the kernel.  ``quantized`` is an
    XLA gather on the codes (exact; DCE'd when the caller only needs codes).
    """
    n, d = flat.shape
    k = embeddings.shape[1]
    n_pad = -(-n // tile) * tile
    flat = flat.astype(jnp.float32)
    padded = jnp.pad(flat, ((0, n_pad - n), (0, 0)))
    embeddings = embeddings.astype(jnp.float32)

    e2 = jnp.sum(jnp.square(embeddings), axis=0)[None, :]  # (1, K)
    grid = n_pad // tile

    codes2d, mn = pl.pallas_call(
        functools.partial(_assign_kernel, n),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tile, d), lambda i: (i, 0)),
            pl.BlockSpec((d, k), lambda i: (0, 0)),
            pl.BlockSpec((1, k), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((tile, 1), lambda i: (i, 0)),
            pl.BlockSpec((d + _ONES, k), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((d + _ONES, k), jnp.float32),
        ],
        interpret=interpret,
    )(padded, embeddings, e2)

    codes = codes2d.reshape(-1)[:n]
    quant = jnp.take(embeddings.T, codes, axis=0)
    return codes, quant, mn[:d], mn[d]


def _encode_kernel(flat_ref, emb_ref, e2_ref, codes_ref):
    z = flat_ref[:]
    scores = jnp.dot(z, emb_ref[:], preferred_element_type=jnp.float32)
    dist = e2_ref[:] - 2.0 * scores
    codes_ref[:] = jnp.argmin(dist, axis=1).astype(jnp.int32)[:, None]


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def fused_vq_encode(
    flat: jnp.ndarray,        # (N, D) float32 encoder outputs
    embeddings: jnp.ndarray,  # (D, K) float32 codebook
    *,
    tile: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Codes-only nearest-neighbour assignment: (N,) int32.

    The encode/serving hot path (VQVAE.encode -> token ids,
    /root/reference/vqvae.py:208-236) needs neither the quantized vectors nor
    the EMA statistics; this variant does just scores+argmin.  Measured at
    the flagship shape it ties XLA's DCE'd encode path (both are VPU-argmin
    bound), so it is opt-in (``use_pallas=True``) rather than the default.
    """
    n, d = flat.shape
    k = embeddings.shape[1]
    n_pad = -(-n // tile) * tile
    padded = jnp.pad(flat.astype(jnp.float32), ((0, n_pad - n), (0, 0)))
    embeddings = embeddings.astype(jnp.float32)
    e2 = jnp.sum(jnp.square(embeddings), axis=0)[None, :]

    codes2d = pl.pallas_call(
        _encode_kernel,
        grid=(n_pad // tile,),
        in_specs=[
            pl.BlockSpec((tile, d), lambda i: (i, 0)),
            pl.BlockSpec((d, k), lambda i: (0, 0)),
            pl.BlockSpec((1, k), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tile, 1), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
        interpret=interpret,
    )(padded, embeddings, e2)
    return codes2d.reshape(-1)[:n]


def fused_vq_assign_sharded(
    flat: jnp.ndarray,        # (N, D) rows sharded over `data_axis`
    embeddings: jnp.ndarray,  # (D, K) replicated codebook
    *,
    mesh: Mesh,
    data_axis: str = "data",
    tile: int = 512,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """GSPMD-safe fused assignment for data-parallel train steps.

    A bare pallas_call inside a GSPMD-sharded program would be replicated
    (full all-gather of the encoder outputs); this wrapper runs the kernel
    per shard under shard_map and ``psum``s the EMA partial statistics over
    ``data_axis``, so the returned ``m_batch``/``n_batch`` are *global*
    batch sums — the cross-replica codebook-sync requirement of
    /root/reference/VectorQuantizer.py:123-131 under data parallelism
    (SURVEY.md §2.2).  codes/quantized stay sharded like the input rows.
    """
    def shard_fn(flat_shard, emb):
        codes, quant, m_b, n_b = fused_vq_assign(
            flat_shard, emb, tile=tile, interpret=interpret)
        return (codes, quant,
                jax.lax.psum(m_b, data_axis), jax.lax.psum(n_b, data_axis))

    kwargs = dict(
        mesh=mesh,
        in_specs=(P(data_axis), P()),
        out_specs=(P(data_axis), P(data_axis), P(), P()),
    )
    try:
        # pallas_call's out_shape carries no varying-mesh-axes info, so the
        # replication checker must be off (the psums make the stats safe).
        wrapped = shard_map(shard_fn, check_vma=False, **kwargs)
    except TypeError:  # pragma: no cover - older jax spells it check_rep
        wrapped = shard_map(shard_fn, check_rep=False, **kwargs)
    return wrapped(flat, embeddings)
