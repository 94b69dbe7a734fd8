"""VQ kernel variant lab — measures fused-assign variants on real TPU.

Round-3 experiment (VERDICT.md item 1): the round-2 fused kernel LOSES to XLA
(650 vs 573 us) at the flagship encode shape (28672, 64) x (64, 512).
Hypotheses:
  H1  the in-kernel quant matmul (onehot @ E^T) is wasted work — XLA does an
      exact, cheap gather (jnp.take) instead, and for encode-only callers the
      XLA path DCEs it entirely while the kernel always pays.
  H2  the VPU n-sum (sum over onehot rows) can ride the MXU for free by
      appending a ones-column to z before the m matmul.
  H3  a codes-only kernel (scores+argmin, nothing else) should crush the XLA
      encode path, which still materializes the (N, K) distance matrix in HBM.
  H4  f32 matmuls in Mosaic are multi-pass; bf16 inputs with f32 accumulation
      are ~3x faster per MXU pass (numerics note: XLA's own f32 dot on TPU
      defaults to bf16 inputs too).

Usage: python scripts/vq_kernel_lab.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, D, K = 28672, 64, 512


def bench(fn, *args, iters=1000):
    from vae_music_tpu.utils.profiling import measure_rtt

    out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: None, out)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[-1]))
    rtt = measure_rtt()   # sub-ms kernels: the per-fetch RTT must be
    t0 = time.time()      # amortized over MANY reps and subtracted
    for _ in range(iters):
        out = fn(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[-1]))
    return (time.time() - t0 - rtt) / iters * 1e6


# ---------------- XLA references ----------------------------------------
@jax.jit
def xla_full(f, e):
    sim = jnp.dot(f, e, preferred_element_type=jnp.float32)
    dist = jnp.sum(jnp.square(e), axis=0)[None, :] - 2.0 * sim
    codes = jnp.argmin(dist, axis=1).astype(jnp.int32)
    q = jnp.take(e.T, codes, axis=0)
    onehot = jax.nn.one_hot(codes, K, dtype=jnp.float32)
    m = jnp.dot(f.T, onehot, preferred_element_type=jnp.float32)
    return codes, q, m, jnp.sum(onehot, axis=0)


@jax.jit
def xla_codes(f, e):
    sim = jnp.dot(f, e, preferred_element_type=jnp.float32)
    dist = jnp.sum(jnp.square(e), axis=0)[None, :] - 2.0 * sim
    return (jnp.argmin(dist, axis=1).astype(jnp.int32),)


# ---------------- variant A: round-2 kernel (3 matmuls in kernel) -------
def _kern_a(flat_ref, emb_ref, embt_ref, e2_ref, codes_ref, quant_ref, m_ref, n_ref):
    i = pl.program_id(0)
    z = flat_ref[:]
    scores = jnp.dot(z, emb_ref[:], preferred_element_type=jnp.float32)
    dist = e2_ref[:] - 2.0 * scores
    codes = jnp.argmin(dist, axis=1).astype(jnp.int32)
    onehot = (jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
              == codes[:, None]).astype(jnp.float32)
    quant_ref[:] = jnp.dot(onehot, embt_ref[:], preferred_element_type=jnp.float32)
    codes_ref[:] = codes[:, None]
    m_tile = jnp.dot(z.T, onehot, preferred_element_type=jnp.float32)
    n_tile = jnp.sum(onehot, axis=0)[None, :]

    @pl.when(i == 0)
    def _():
        m_ref[:] = m_tile
        n_ref[:] = n_tile

    @pl.when(i > 0)
    def _():
        m_ref[:] += m_tile
        n_ref[:] += n_tile


@functools.partial(jax.jit, static_argnames=("tile",))
def variant_a(flat, emb, tile=1024):
    e2 = jnp.sum(jnp.square(emb), axis=0)[None, :]
    grid = N // tile
    codes2d, quant, m, n = pl.pallas_call(
        _kern_a,
        grid=(grid,),
        in_specs=[pl.BlockSpec((tile, D), lambda i: (i, 0)),
                  pl.BlockSpec((D, K), lambda i: (0, 0)),
                  pl.BlockSpec((K, D), lambda i: (0, 0)),
                  pl.BlockSpec((1, K), lambda i: (0, 0))],
        out_specs=[pl.BlockSpec((tile, 1), lambda i: (i, 0)),
                   pl.BlockSpec((tile, D), lambda i: (i, 0)),
                   pl.BlockSpec((D, K), lambda i: (0, 0)),
                   pl.BlockSpec((1, K), lambda i: (0, 0))],
        out_shape=[jax.ShapeDtypeStruct((N, 1), jnp.int32),
                   jax.ShapeDtypeStruct((N, D), jnp.float32),
                   jax.ShapeDtypeStruct((D, K), jnp.float32),
                   jax.ShapeDtypeStruct((1, K), jnp.float32)],
    )(flat, emb, emb.T, e2)
    return codes2d.reshape(-1), quant, m, n[0]


# ---------------- variant B: stats in kernel, quant via external take ----
def _kern_b(flat_ref, emb_ref, e2_ref, codes_ref, m_ref, n_ref):
    i = pl.program_id(0)
    z = flat_ref[:]
    scores = jnp.dot(z, emb_ref[:], preferred_element_type=jnp.float32)
    dist = e2_ref[:] - 2.0 * scores
    codes = jnp.argmin(dist, axis=1).astype(jnp.int32)
    onehot = (jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
              == codes[:, None]).astype(jnp.float32)
    codes_ref[:] = codes[:, None]
    m_tile = jnp.dot(z.T, onehot, preferred_element_type=jnp.float32)
    n_tile = jnp.sum(onehot, axis=0)[None, :]

    @pl.when(i == 0)
    def _():
        m_ref[:] = m_tile
        n_ref[:] = n_tile

    @pl.when(i > 0)
    def _():
        m_ref[:] += m_tile
        n_ref[:] += n_tile


@functools.partial(jax.jit, static_argnames=("tile",))
def variant_b(flat, emb, tile=1024):
    e2 = jnp.sum(jnp.square(emb), axis=0)[None, :]
    grid = N // tile
    codes2d, m, n = pl.pallas_call(
        _kern_b,
        grid=(grid,),
        in_specs=[pl.BlockSpec((tile, D), lambda i: (i, 0)),
                  pl.BlockSpec((D, K), lambda i: (0, 0)),
                  pl.BlockSpec((1, K), lambda i: (0, 0))],
        out_specs=[pl.BlockSpec((tile, 1), lambda i: (i, 0)),
                   pl.BlockSpec((D, K), lambda i: (0, 0)),
                   pl.BlockSpec((1, K), lambda i: (0, 0))],
        out_shape=[jax.ShapeDtypeStruct((N, 1), jnp.int32),
                   jax.ShapeDtypeStruct((D, K), jnp.float32),
                   jax.ShapeDtypeStruct((1, K), jnp.float32)],
    )(flat, emb, e2)
    codes = codes2d.reshape(-1)
    quant = jnp.take(emb.T, codes, axis=0)
    return codes, quant, m, n[0]


# ---------------- variant C: B + ones column folds n into the m matmul ---
def _kern_c(flat_ref, emb_ref, e2_ref, codes_ref, mn_ref):
    i = pl.program_id(0)
    z = flat_ref[:]                                  # (tile, D)
    scores = jnp.dot(z, emb_ref[:], preferred_element_type=jnp.float32)
    dist = e2_ref[:] - 2.0 * scores
    codes = jnp.argmin(dist, axis=1).astype(jnp.int32)
    onehot = (jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
              == codes[:, None]).astype(jnp.float32)
    codes_ref[:] = codes[:, None]
    za = jnp.concatenate([z, jnp.ones((z.shape[0], 8), jnp.float32)], axis=1)
    mn_tile = jnp.dot(za.T, onehot, preferred_element_type=jnp.float32)  # (D+8, K)

    @pl.when(i == 0)
    def _():
        mn_ref[:] = mn_tile

    @pl.when(i > 0)
    def _():
        mn_ref[:] += mn_tile


@functools.partial(jax.jit, static_argnames=("tile",))
def variant_c(flat, emb, tile=1024):
    e2 = jnp.sum(jnp.square(emb), axis=0)[None, :]
    grid = N // tile
    codes2d, mn = pl.pallas_call(
        _kern_c,
        grid=(grid,),
        in_specs=[pl.BlockSpec((tile, D), lambda i: (i, 0)),
                  pl.BlockSpec((D, K), lambda i: (0, 0)),
                  pl.BlockSpec((1, K), lambda i: (0, 0))],
        out_specs=[pl.BlockSpec((tile, 1), lambda i: (i, 0)),
                   pl.BlockSpec((D + 8, K), lambda i: (0, 0))],
        out_shape=[jax.ShapeDtypeStruct((N, 1), jnp.int32),
                   jax.ShapeDtypeStruct((D + 8, K), jnp.float32)],
    )(flat, emb, e2)
    codes = codes2d.reshape(-1)
    quant = jnp.take(emb.T, codes, axis=0)
    return codes, quant, mn[:D], mn[D]


# ---------------- variant E: codes-only kernel ---------------------------
def _kern_e(flat_ref, emb_ref, e2_ref, codes_ref):
    z = flat_ref[:]
    scores = jnp.dot(z, emb_ref[:], preferred_element_type=jnp.float32)
    dist = e2_ref[:] - 2.0 * scores
    codes_ref[:] = jnp.argmin(dist, axis=1).astype(jnp.int32)[:, None]


@functools.partial(jax.jit, static_argnames=("tile",))
def variant_e(flat, emb, tile=1024):
    e2 = jnp.sum(jnp.square(emb), axis=0)[None, :]
    grid = N // tile
    codes2d = pl.pallas_call(
        _kern_e,
        grid=(grid,),
        in_specs=[pl.BlockSpec((tile, D), lambda i: (i, 0)),
                  pl.BlockSpec((D, K), lambda i: (0, 0)),
                  pl.BlockSpec((1, K), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((tile, 1), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((N, 1), jnp.int32),
    )(flat, emb, e2)
    return (codes2d.reshape(-1),)


# ---------------- variant F: C with bf16 scores matmul -------------------
def _kern_f(flat_ref, emb_ref, e2_ref, codes_ref, mn_ref):
    i = pl.program_id(0)
    z = flat_ref[:]
    scores = jnp.dot(z.astype(jnp.bfloat16), emb_ref[:].astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
    dist = e2_ref[:] - 2.0 * scores
    codes = jnp.argmin(dist, axis=1).astype(jnp.int32)
    onehot = (jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
              == codes[:, None]).astype(jnp.float32)
    codes_ref[:] = codes[:, None]
    za = jnp.concatenate([z, jnp.ones((z.shape[0], 8), jnp.float32)], axis=1)
    mn_tile = jnp.dot(za.T, onehot, preferred_element_type=jnp.float32)

    @pl.when(i == 0)
    def _():
        mn_ref[:] = mn_tile

    @pl.when(i > 0)
    def _():
        mn_ref[:] += mn_tile


@functools.partial(jax.jit, static_argnames=("tile",))
def variant_f(flat, emb, tile=1024):
    e2 = jnp.sum(jnp.square(emb), axis=0)[None, :]
    grid = N // tile
    codes2d, mn = pl.pallas_call(
        _kern_f,
        grid=(grid,),
        in_specs=[pl.BlockSpec((tile, D), lambda i: (i, 0)),
                  pl.BlockSpec((D, K), lambda i: (0, 0)),
                  pl.BlockSpec((1, K), lambda i: (0, 0))],
        out_specs=[pl.BlockSpec((tile, 1), lambda i: (i, 0)),
                   pl.BlockSpec((D + 8, K), lambda i: (0, 0))],
        out_shape=[jax.ShapeDtypeStruct((N, 1), jnp.int32),
                   jax.ShapeDtypeStruct((D + 8, K), jnp.float32)],
    )(flat, emb, e2)
    codes = codes2d.reshape(-1)
    quant = jnp.take(emb.T, codes, axis=0)
    return codes, quant, mn[:D], mn[D]


# ---------------- variant G: C with manual two-stage argmin --------------
def _kern_g(flat_ref, emb_ref, e2_ref, codes_ref, mn_ref):
    i = pl.program_id(0)
    z = flat_ref[:]
    scores = jnp.dot(z, emb_ref[:], preferred_element_type=jnp.float32)
    dist = e2_ref[:] - 2.0 * scores                  # (tile, K)
    # stage 1: fold the 4 lane-tiles with elementwise mins
    h = dist[:, :128]
    for c in range(1, K // 128):
        h = jnp.minimum(h, dist[:, c * 128:(c + 1) * 128])
    minv = jnp.min(h, axis=1, keepdims=True)          # (tile, 1)
    # stage 2: first index achieving the min (matches argmin tie-break)
    iota = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
    codes = jnp.min(jnp.where(dist == minv, iota, K), axis=1).astype(jnp.int32)
    onehot = (iota == codes[:, None]).astype(jnp.float32)
    codes_ref[:] = codes[:, None]
    za = jnp.concatenate([z, jnp.ones((z.shape[0], 8), jnp.float32)], axis=1)
    mn_tile = jnp.dot(za.T, onehot, preferred_element_type=jnp.float32)

    @pl.when(i == 0)
    def _():
        mn_ref[:] = mn_tile

    @pl.when(i > 0)
    def _():
        mn_ref[:] += mn_tile


@functools.partial(jax.jit, static_argnames=("tile",))
def variant_g(flat, emb, tile=1024):
    e2 = jnp.sum(jnp.square(emb), axis=0)[None, :]
    grid = N // tile
    codes2d, mn = pl.pallas_call(
        _kern_g,
        grid=(grid,),
        in_specs=[pl.BlockSpec((tile, D), lambda i: (i, 0)),
                  pl.BlockSpec((D, K), lambda i: (0, 0)),
                  pl.BlockSpec((1, K), lambda i: (0, 0))],
        out_specs=[pl.BlockSpec((tile, 1), lambda i: (i, 0)),
                   pl.BlockSpec((D + 8, K), lambda i: (0, 0))],
        out_shape=[jax.ShapeDtypeStruct((N, 1), jnp.int32),
                   jax.ShapeDtypeStruct((D + 8, K), jnp.float32)],
    )(flat, emb, e2)
    codes = codes2d.reshape(-1)
    quant = jnp.take(emb.T, codes, axis=0)
    return codes, quant, mn[:D], mn[D]


def main():
    rng = np.random.default_rng(0)
    flat = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)
    emb = jnp.asarray(rng.uniform(-0.05, 0.05, (D, K)), jnp.float32)

    ref_codes, ref_q, ref_m, ref_n = jax.device_get(xla_full(flat, emb))

    rows = []
    rows.append(("xla_full", bench(xla_full, flat, emb)))
    rows.append(("xla_codes_only", bench(xla_codes, flat, emb)))
    for name, fn in [("A_round2", variant_a), ("B_take_quant", variant_b),
                     ("C_fold_n", variant_c), ("F_bf16_scores", variant_f),
                     ("G_manual_argmin", variant_g)]:
        for tile in (512, 1024, 2048, 4096):
            f = functools.partial(fn, tile=tile)
            us = bench(f, flat, emb)
            codes, q, m, n = jax.device_get(f(flat, emb))
            flips = int((codes != ref_codes).sum())
            m_err = float(np.abs(m - ref_m).max())
            rows.append((f"{name}_t{tile}", us,
                         f"flips={flips} m_err={m_err:.2e}"))
    for tile in (512, 1024, 2048, 4096):
        f = functools.partial(variant_e, tile=tile)
        us = bench(f, flat, emb)
        codes = jax.device_get(f(flat, emb))[0]
        flips = int((codes != ref_codes).sum())
        rows.append((f"E_codes_only_t{tile}", us, f"flips={flips}"))

    for r in rows:
        name, us = r[0], r[1]
        note = r[2] if len(r) > 2 else ""
        print(f"{name:24s} {us:8.1f} us   {note}")


if __name__ == "__main__":
    main()
