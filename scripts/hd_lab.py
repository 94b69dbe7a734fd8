"""int8-vs-bf16 KV-cache lab across head dims (TPU measurement aid).

docs/SERVING.md records that int8 caches LOSE at the flagship hd=16 (the
int8->f32 convert pass over every history element plus 2x the DMA part count
outweigh the 37.5%-smaller history reads once the prefetch pipeline is
balanced).  The scale side-caches shrink relative to the values as hd grows
(one scale per (position, lane) vs hd values), and the DMA saving approaches
a flat 2x — so the breakeven should sit at some larger head dim.  This lab
measures it: fused level-top decode at width 512, ctx 896, blocks 8, depth 6,
heads in {32, 8, 4} -> hd in {16, 64, 128}, bf16 vs int8 caches.

Usage: python scripts/hd_lab.py [batch]   (default 64)
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
    from vae_music_tpu.configs import PriorConfig, VQVAEConfig
    from vae_music_tpu.models.prior import FMHAPrior
    from vae_music_tpu.sample.decode import SampleMode, make_decode_fn
    from vae_music_tpu.train.prior_step import init_prior
    from vae_music_tpu.utils.profiling import measure_rtt

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    # One-level prior over the FULL_PIPELINE bottom grid (ctx 896, blocks 8)
    # so no conditioner stream is needed; width 512 leaves heads free to set
    # the head dim without changing total FLOPs or cache bytes.
    vcfg = VQVAEConfig(
        sample_length=28672, levels=1, down_depth=(5,), strides=(2,),
        latent_dim=16, codebook_size=64, residual_width=16, residual_depth=1,
        dilation_factor=3, use_spectral_loss=False).validate()
    ctx = vcfg.z_lengths[0]
    rtt = measure_rtt()
    print(f"rtt {rtt*1e3:.1f} ms; ctx {ctx}, width 512, depth 6, "
          f"batch {batch}")

    for heads in (32, 8, 4):
        pcfg = PriorConfig(
            level=0, levels=1, bins=2048, width=512, depth=6, heads=heads,
            blocks=8, attn_stacks=1, dropout=0.0, genre_classes=10)
        model, params = init_prior(jax.random.PRNGKey(1), vcfg, pcfg)
        y_cond = model.apply(params, jnp.zeros((batch,), jnp.int32),
                             method=FMHAPrior.embed_labels)
        hd = pcfg.width // heads
        row = {}
        for cache_dtype in ("bfloat16", "int8"):
            try:
                fn = make_decode_fn(pcfg, ctx, batch, mode=SampleMode.GUMBEL,
                                    cache_dtype=cache_dtype, fused=True)
                out = fn(params, jax.random.PRNGKey(7), None, y_cond)
                _ = float(jnp.sum(out.astype(jnp.float32)))
                iters = 10
                t0 = time.time()
                for _ in range(iters):
                    out = fn(params, jax.random.PRNGKey(7), None, y_cond)
                _ = float(jnp.sum(out.astype(jnp.float32)))
                us = (time.time() - t0 - rtt) / iters / ctx * 1e6
                row[cache_dtype] = us
                print(f"hd {hd:4d} (heads {heads:2d}) {cache_dtype:9s}: "
                      f"{us:7.1f} us/step")
            except Exception as e:  # VMEM OOM etc — record and move on
                print(f"hd {hd:4d} (heads {heads:2d}) {cache_dtype:9s}: "
                      f"FAILED {type(e).__name__}: {str(e)[:110]}")
        if len(row) == 2:
            print(f"   -> int8/bf16 = {row['int8'] / row['bfloat16']:.3f}")


if __name__ == "__main__":
    main()
