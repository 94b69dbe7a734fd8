"""Fused VQ codebook kernel (Pallas/TPU).

Fuses the codebook hot path of /root/reference/VectorQuantizer.py:75-131 into
one VMEM-resident pass per input tile:

    scores   = z @ E                    (MXU)
    dist     = |e_k|^2 - 2*scores       (VPU; |z|^2 is constant in k)
    codes    = argmin_k dist            (VPU)
    quant    = onehot(codes) @ E^T      (MXU — gather-free lookup)
    m_tile   = z^T @ onehot             (MXU — EMA cluster-sum partials)
    n_tile   = sum_k onehot             (VPU — EMA count partials)

The codebook (D=64, K=512 -> 128 KB) stays in VMEM across all grid steps; the
(N, K) distance matrix never touches HBM (the XLA path materializes it).  EMA
partials are accumulated across grid steps into a single VMEM block, so the
train-time quantize needs no second pass over the data.

The jnp reference implementation lives in vae_music_tpu.nn.quantizer;
tests compare both paths bit-for-bit (argmin tie-breaking included) in
interpret mode on CPU.  Dispatch policy (see nn/quantizer.quantize):
``quantize(use_pallas=None)`` auto-routes here on a TPU backend — directly
for single-chip encode/serve/train, and through ``fused_vq_assign_sharded``
(per-shard kernel + psum'd EMA partials under shard_map) when a mesh is
given for a GSPMD data-parallel train step.
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


def vq_pallas_available() -> bool:
    return _HAS_PLTPU and jax.default_backend() not in ("cpu",)


def _kernel(flat_ref, emb_ref, embt_ref, e2_ref,
            codes_ref, quant_ref, m_ref, n_ref):
    i = pl.program_id(0)

    z = flat_ref[:]                       # (TILE, D)
    emb = emb_ref[:]                      # (D, K)

    scores = jnp.dot(z, emb, preferred_element_type=jnp.float32)   # (TILE, K)
    dist = e2_ref[:] - 2.0 * scores
    codes = jnp.argmin(dist, axis=1).astype(jnp.int32)             # (TILE,)

    k = emb.shape[1]
    onehot = (jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
              == codes[:, None]).astype(jnp.float32)               # (TILE, K)

    quant_ref[:] = jnp.dot(onehot, embt_ref[:],
                           preferred_element_type=jnp.float32)     # (TILE, D)
    codes_ref[:] = codes[:, None]

    # EMA partial statistics, accumulated across the (sequential) grid.
    m_tile = jnp.dot(z.T, onehot, preferred_element_type=jnp.float32)  # (D, K)
    n_tile = jnp.sum(onehot, axis=0)[None, :]                          # (1, K)

    @pl.when(i == 0)
    def _():
        m_ref[:] = m_tile
        n_ref[:] = n_tile

    @pl.when(i > 0)
    def _():
        m_ref[:] += m_tile
        n_ref[:] += n_tile


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def fused_vq_assign(
    flat: jnp.ndarray,        # (N, D) float32 encoder outputs
    embeddings: jnp.ndarray,  # (D, K) float32 codebook
    *,
    tile: int = 1024,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (codes (N,), quantized (N, D), m_batch (D, K), n_batch (K,)).

    Pure assignment + statistics (no gradient path; callers wrap with the
    straight-through estimator).  Pads N up to a tile multiple; padded rows
    are masked out of the statistics.
    """
    n, d = flat.shape
    k = embeddings.shape[1]
    n_pad = -(-n // tile) * tile
    padded = jnp.pad(flat, ((0, n_pad - n), (0, 0)))

    e2 = jnp.sum(jnp.square(embeddings), axis=0)[None, :]  # (1, K)
    grid = n_pad // tile

    codes2d, quant, m_batch, n_batch = pl.pallas_call(
        _kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tile, d), lambda i: (i, 0)),
            pl.BlockSpec((d, k), lambda i: (0, 0)),
            pl.BlockSpec((k, d), lambda i: (0, 0)),
            pl.BlockSpec((1, k), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((tile, 1), lambda i: (i, 0)),
            pl.BlockSpec((tile, d), lambda i: (i, 0)),
            pl.BlockSpec((d, k), lambda i: (0, 0)),
            pl.BlockSpec((1, k), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((n_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((d, k), jnp.float32),
            jax.ShapeDtypeStruct((1, k), jnp.float32),
        ],
        interpret=interpret,
    )(padded.astype(jnp.float32), embeddings.astype(jnp.float32),
      embeddings.T.astype(jnp.float32), e2.astype(jnp.float32))

    codes = codes2d.reshape(-1)[:n]
    quant = quant[:n]
    if n_pad != n:
        # Remove padded rows' contribution (they all land on some code).
        pad_flat = padded[n:]
        pad_codes = codes2d.reshape(-1)[n:]
        pad_onehot = jax.nn.one_hot(pad_codes, k, dtype=jnp.float32)
        m_batch = m_batch - pad_flat.T @ pad_onehot
        n_batch = n_batch - jnp.sum(pad_onehot, axis=0)[None, :]
    return codes, quant, m_batch, n_batch[0]


def fused_vq_assign_sharded(
    flat: jnp.ndarray,        # (N, D) rows sharded over `data_axis`
    embeddings: jnp.ndarray,  # (D, K) replicated codebook
    *,
    mesh: Mesh,
    data_axis: str = "data",
    tile: int = 1024,
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
