"""Decode-kernel perf lab: measure the fused level-0 decode at different
history-pipeline depths (hist_slots) and lane tilings on the real TPU.

The DMA probe measured this chip sustaining 581 GB/s at 2 history slots vs
616-641 GB/s at 3-4 slots (more in-flight bytes cover the latency-bandwidth
product), so deeper pipelines should shave the DMA-bound decode step.  The
production default (ops/decode_pallas.HIST_SLOTS) is whatever wins here.

Usage: python scripts/decode_lab.py [batch ...]   (default: 256 512)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/vmt_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp


def main():
    from vae_music_tpu.configs import get_config
    from vae_music_tpu.ops import decode_pallas
    from vae_music_tpu.sample.decode import SampleMode, make_decode_fn
    from vae_music_tpu.sample.sampler import AncestralSampler
    from vae_music_tpu.utils.profiling import measure_rtt

    cache_dtype = "bfloat16"
    batches = []
    for a in sys.argv[1:]:
        if a.startswith("dtype="):
            cache_dtype = a.split("=", 1)[1]
        else:
            batches.append(int(a))
    batches = batches or [256, 512]
    scfg = get_config("FULL_PIPELINE")
    sampler = AncestralSampler.from_config(scfg, jax.random.PRNGKey(0))
    level = 0
    spec = sampler.specs[level]
    pcfg = sampler.prior_cfgs[level]
    params = sampler.prior_params[level]
    rtt = measure_rtt()
    print(f"rtt {rtt*1e3:.1f} ms; level-0 ctx {spec.ctx_len}")

    auto_tiles = decode_pallas._auto_lane_tiles

    def run(batch, hist_slots, force_tiles=None):
        if force_tiles is not None:
            decode_pallas._auto_lane_tiles = (
                lambda *a, **k: force_tiles)
        try:
            x_cond = jnp.zeros((batch, spec.ctx_len, pcfg.width), jnp.float32)
            y_cond = sampler._label_embedder(level)(
                params, jnp.zeros((batch,), jnp.int32))
            fn = make_decode_fn(pcfg, spec.ctx_len, batch,
                                mode=SampleMode.GUMBEL,
                                cache_dtype=cache_dtype,
                                hist_slots=hist_slots)
            out = fn(params, jax.random.PRNGKey(7), x_cond, y_cond)
            _ = float(jnp.sum(out.astype(jnp.float32)))
            iters = 20
            t0 = time.time()
            for _ in range(iters):
                out = fn(params, jax.random.PRNGKey(7), x_cond, y_cond)
            _ = float(jnp.sum(out.astype(jnp.float32)))
            dt = (time.time() - t0 - rtt) / iters
            us = dt / spec.ctx_len * 1e6
            nh = batch * pcfg.heads
            tiles = (force_tiles if force_tiles is not None else
                     decode_pallas.decode_cache_lane_tiles(
                         nh, spec.ctx_len // pcfg.blocks,
                         pcfg.attn_width // pcfg.heads,
                         jnp.dtype(cache_dtype), pcfg.blocks, hist_slots))
            print(f"batch {batch:4d} hist_slots={hist_slots} "
                  f"tiles={tiles}: {dt*1e3:7.2f} ms "
                  f"({us:6.1f} us/step, {batch/dt:8.0f} seq/s)")
        except Exception as e:  # VMEM OOM etc — record and move on
            print(f"batch {batch:4d} hist_slots={hist_slots} "
                  f"tiles={force_tiles}: FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}")
        finally:
            decode_pallas._auto_lane_tiles = auto_tiles

    for batch in batches:
        run(batch, 2)                      # production default (tiles auto)
        run(batch, 3)                      # deeper pipeline (auto -> 4 tiles)
        run(batch, 4)
        if batch * pcfg.heads >= 512:
            run(batch, 3, force_tiles=2)   # deep pipeline, wide tiles (VMEM edge)


if __name__ == "__main__":
    main()
