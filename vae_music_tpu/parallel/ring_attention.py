"""Sequence-parallel (context-parallel) factorized attention over a device mesh.

SURVEY.md §5: the (blocks x block_len) grid of the factorized attention makes
the *blocks* axis the natural shard dimension for sequences that exceed one
chip.  This module implements the three patterns as explicit shard_map
programs over a 'seq' mesh axis (collectives ride ICI):

  * row      — fully local: every block attends within itself; zero comms
  * prev_row — ring: each device ppermute's its LAST block's K/V to the next
               device (one hop, ring-attention style); the globally-first
               block sees zeros (factorized_attention.py:341-344 semantics)
  * col      — all-gather: queries at offset i attend column i of ALL
               previous blocks, so K/V columns are all-gathered then causally
               masked over the global block index.

Equality against the single-device implementations (nn/attention.py) is
tested on the 8-device CPU mesh (tests/test_ring_attention.py).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.7 promotes shard_map out of experimental
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from vae_music_tpu.nn.attention import causal_mask, masked_mha


def _local_blocks(t: jnp.ndarray, block_len: int):
    n, l_loc, h, hd = t.shape
    return t.reshape(n, l_loc // block_len, block_len, h, hd)


def _row_local(q, k, v, block_len):
    """Row attention is embarrassingly parallel over blocks: zero comms."""
    n, l_loc, h, hd = q.shape
    nb = l_loc // block_len
    rs = lambda t: t.reshape(n * nb, block_len, h, hd)
    out, _ = masked_mha(rs(q), rs(k), rs(v), causal_mask(block_len, block_len))
    return out.reshape(n, l_loc, h, hd)


def _prev_row_ring(q, k, v, block_len, axis_name):
    """Each device sends its LAST block's K/V one hop around the ring."""
    n, l_loc, h, hd = q.shape
    nb = l_loc // block_len
    kb, vb = _local_blocks(k, block_len), _local_blocks(v, block_len)

    size = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    perm = [(i, (i + 1) % size) for i in range(size)]
    k_in = jax.lax.ppermute(kb[:, -1], axis_name, perm)   # (N, l, H, hd)
    v_in = jax.lax.ppermute(vb[:, -1], axis_name, perm)
    # The globally-first block's "previous block" is zeros.
    is_first = (idx == 0).astype(k_in.dtype)
    k_in = k_in * (1.0 - is_first)
    v_in = v_in * (1.0 - is_first)

    k_prev = jnp.concatenate([k_in[:, None], kb[:, :-1]], axis=1)
    v_prev = jnp.concatenate([v_in[:, None], vb[:, :-1]], axis=1)

    rs = lambda t: t.reshape(n * nb, block_len, h, hd)
    out, _ = masked_mha(rs(_local_blocks(q, block_len)), rs(k_prev),
                        rs(v_prev), mask=None)
    return out.reshape(n, l_loc, h, hd)


def _col_allgather(q, k, v, block_len, axis_name):
    """Columns span every block: all-gather K/V, mask by global block index."""
    n, l_loc, h, hd = q.shape
    nb_loc = l_loc // block_len
    size = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)

    kg = jax.lax.all_gather(_local_blocks(k, block_len), axis_name)  # (S, N, nb, l, H, hd)
    vg = jax.lax.all_gather(_local_blocks(v, block_len), axis_name)
    s = kg.shape[0]
    nb_glob = s * nb_loc
    kg = jnp.moveaxis(kg, 0, 1).reshape(n, nb_glob, block_len, h, hd)
    vg = jnp.moveaxis(vg, 0, 1).reshape(n, nb_glob, block_len, h, hd)

    # local queries in column-major view: (N*l, nb_loc, H, hd)
    qb = _local_blocks(q, block_len).transpose(0, 2, 1, 3, 4)
    qb = qb.reshape(n * block_len, nb_loc, h, hd)
    kc = kg.transpose(0, 2, 1, 3, 4).reshape(n * block_len, nb_glob, h, hd)
    vc = vg.transpose(0, 2, 1, 3, 4).reshape(n * block_len, nb_glob, h, hd)

    # causal over GLOBAL block index: local block j_loc is global idx*nb+j_loc
    q_ids = idx * nb_loc + jnp.arange(nb_loc)
    mask = q_ids[:, None] >= jnp.arange(nb_glob)[None, :]
    out, _ = masked_mha(qb, kc, vc, mask)
    out = (out.reshape(n, block_len, nb_loc, h, hd)
           .transpose(0, 2, 1, 3, 4)
           .reshape(n, l_loc, h, hd))
    return out


def sequence_parallel_attention(
    q: jnp.ndarray,  # (N, T, H, hd) global
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    pattern: int,            # 0=row, 1=col, 2=prev_row
    block_len: int,
    mesh: Mesh,
    axis_name: str = "seq",
) -> jnp.ndarray:
    """Run one factorized-attention pattern with the sequence sharded over
    ``axis_name``.  T must divide into blocks that divide evenly across the
    axis.  Returns the (sequence-sharded) output."""
    t = q.shape[1]
    size = mesh.shape[axis_name]
    assert t % block_len == 0
    blocks = t // block_len
    assert blocks % size == 0, f"{blocks} blocks must divide {size} devices"

    if pattern == 0:
        body = partial(_row_local, block_len=block_len)
        comm = P()
    elif pattern == 2:
        body = partial(_prev_row_ring, block_len=block_len,
                       axis_name=axis_name)
        comm = None
    else:
        body = partial(_col_allgather, block_len=block_len,
                       axis_name=axis_name)
        comm = None

    spec = P(None, axis_name, None, None)
    fn = shard_map(body, mesh=mesh, in_specs=(spec, spec, spec),
                   out_specs=spec)
    return fn(q, k, v)
