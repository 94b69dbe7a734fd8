"""Serve the Jukebox-scale prior: fused decode at the JUKEBOX_SMALL_PRIOR
geometry (VERDICT r3 weak #8).

scripts/hd_lab.py stopped at width 512; this lab runs the fused decode
kernel at the geometry the reference aspired to
(/root/reference/SMALL_PRIOR_model_structuree:2 — width 1024, 48 blocks,
Embedding(2048,1024), ~160M params): width 1024, depth 48, heads 2
(hd=128), ctx 8192, blocks 8, bins 2049, over the JUKEBOX_VQVAE level-0
grid (262144-sample clips @ 3 kHz, hop 32).  Records us/step and the
implied clips/s per batch size, or the documented VMEM/HBM wall.

Usage: WIDE_FUSED={1|0} python scripts/wide_lab.py [batches...]

Measured 2026-08-19 (one v5e chip, bf16 caches):
  * fused=1 (default): Mosaic COLD-COMPILE WALL — the kernel unrolls all 48
    layers in its body (ops/decode_pallas.py), and a `timeout 2400` run died
    mid-compile with nothing cached.  Only attempt with >=90 min of budget.
    Lane minimum batch*heads % 128 == 0 -> batch 64 with heads=2; but note
    batch-64 bf16 caches are 24 GB, so even a finished compile would OOM —
    this geometry needs the fused kernel PLUS a smaller-footprint cache
    layout or multi-chip sharding to serve fast.
  * fused=0 (WIDE_FUSED=0): the XLA lax.scan path compiles in ~60 s and
    serves batch 16 at 4979 us/step (3213 tok/s) and batch 32 at 5480
    us/step (5840 tok/s, 62.3 one-second-clips/s); batch 64 is a 48 GB
    (f32) / 24 GB (bf16) HBM OOM on the 15.75 GB chip.
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

    fused = os.environ.get("WIDE_FUSED", "1") == "1"
    # fused lane minimum -> 64, and int8 caches (12 GB) are the only
    # capacity-feasible batch-64 config; the XLA path fits bf16 up to 32.
    batches = [int(a) for a in sys.argv[1:]] or ([64] if fused else [16, 32])
    cache_dtype = "int8" if fused else "bfloat16"
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
                                cache_dtype=cache_dtype, fused=fused)
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
            if fused and batch == 64:   # bench.py reuses this fused compile
                try:
                    open(os.path.expanduser(
                        "~/.cache/vmt_jax_cache/WIDE1024_WARM"), "w").write("ok\n")
                except OSError:
                    pass
        except Exception as e:  # VMEM/HBM wall — record it
            row["wall"] = f"{type(e).__name__}: {str(e)[:160]}"
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
