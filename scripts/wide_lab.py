"""Serve the Jukebox-scale prior: fused decode at the JUKEBOX_SMALL_PRIOR
geometry (VERDICT r3 weak #8).

scripts/hd_lab.py stopped at width 512; this lab runs the fused decode
kernel at the geometry the reference aspired to
(/root/reference/SMALL_PRIOR_model_structuree:2 — width 1024, 48 blocks,
Embedding(2048,1024), ~160M params): width 1024, depth 48, heads 2
(hd=128), ctx 8192, blocks 8, bins 2049, over the JUKEBOX_VQVAE level-0
grid (262144-sample clips @ 3 kHz, hop 32).  Records us/step and the
implied clips/s per batch size, or the documented VMEM/HBM wall.

Usage: WIDE_FUSED={grid|1|0} python scripts/wide_lab.py [batches...]

Measured 2026-08-19 (one v5e chip), r5 update 2026-08-20:
  * WIDE_FUSED=grid (default): the r4 LAYER-GRID kernel
    (ops/decode_grid_pallas.py — depth as a sequential grid dimension,
    weights streamed per layer, online-softmax chunked history, int8
    caches): r4 bf16 weights 2960 us/step (21.6k tok/s); r5 with the
    prev_row b==0 skip + int8 streamed weights (now the default)
    2628 us/step — 24.3k tok/s at batch 64.  WIDE_CDT=int4 packs two
    nibbles per cache byte (batch 128 fits one chip).  Roofline and the
    VPU-bound ceiling analysis: scripts/grid_lab.py roofline +
    docs/SERVING.md.
  * WIDE_FUSED=1: the depth-UNROLLED kernel (decode_pallas.py) is a Mosaic
    COLD-COMPILE WALL here — it emits all 48 layers into one program and a
    `timeout 2400` compile died unfinished; its batch-64 lane minimum would
    also need int8 caches to fit.  Only attempt with >=90 min of budget.
  * WIDE_FUSED=0: the XLA lax.scan path (bf16 caches) compiles in ~60 s;
    batch 16 -> 4979 us/step (3213 tok/s), batch 32 -> 5480 us/step
    (5840 tok/s); batch 64 is a 24 GB bf16-cache HBM OOM.  bf16 streamed
    weights measured a no-win on this path (serialization-bound).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/vmt_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp

SAMPLE_RATE = 3000


def main():
    from vae_music_tpu.configs import get_config
    from vae_music_tpu.sample.decode import SampleMode, make_decode_fn
    from vae_music_tpu.utils.profiling import measure_rtt

    kind = os.environ.get("WIDE_FUSED", "grid")
    fused = {"grid": "grid", "1": True, "0": False}[kind]
    # Fused lane minimum -> 64, and int8 caches (12 GB) are the only
    # capacity-feasible batch-64 config; the XLA path fits bf16 up to 32.
    batches = [int(a) for a in sys.argv[1:]] or ([64] if fused else [16, 32])
    cache_dtype = os.environ.get("WIDE_CDT", "int8" if fused else "bfloat16")
    # r5: int8 streamed weights measured faster than bf16 on the grid path
    # (2804 -> 2628 us/step); override with WIDE_WDT=bfloat16|float32|int8.
    weight_dtype = os.environ.get(
        "WIDE_WDT", "int8" if fused == "grid" else "float32")
    pcfg = get_config("JUKEBOX_SMALL_PRIOR")    # width 1024, depth 48, hd 128
    vcfg = get_config("JUKEBOX_VQVAE")
    ctx = vcfg.z_lengths[0]                      # 8192
    assert ctx == 8192, ctx
    rtt = measure_rtt()
    print(f"rtt {rtt*1e3:.1f} ms; JUKEBOX_SMALL_PRIOR width {pcfg.width} "
          f"depth {pcfg.depth} heads {pcfg.heads} ctx {ctx} bins {pcfg.bins}",
          flush=True)

    from vae_music_tpu.train.prior_step import init_prior

    _model, params = init_prior(jax.random.PRNGKey(1), vcfg, pcfg)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"params: {n_params/1e6:.1f}M", flush=True)

    for batch in batches:
        row = {"batch": batch, "fused": fused}
        try:
            fn = make_decode_fn(pcfg, ctx, batch, mode=SampleMode.GUMBEL,
                                cache_dtype=cache_dtype, fused=fused,
                                weight_dtype=weight_dtype)
            out = fn(params, jax.random.PRNGKey(7), None, None)
            _ = float(jnp.sum(out.astype(jnp.float32)))
            iters = 3
            best = float("inf")
            for _rep in range(2):
                t0 = time.time()
                for _ in range(iters):
                    out = fn(params, jax.random.PRNGKey(7), None, None)
                _ = float(jnp.sum(out.astype(jnp.float32)))
                best = min(best, (time.time() - t0 - rtt) / iters)
            us = best / ctx * 1e6
            clip_s = vcfg.sample_length / SAMPLE_RATE        # 87.4 s of audio
            row.update({
                "us_per_step": round(us, 1),
                "tokens_per_sec": round(batch / us * 1e6),
                "clips_1s_per_sec": round(batch * clip_s / best, 1),
            })
        except Exception as e:  # VMEM/HBM wall — record it
            row["wall"] = f"{type(e).__name__}: {str(e)[:160]}"
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
