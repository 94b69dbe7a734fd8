"""Break the ancestral-chain wall time into its stages (TPU timing aid).

Times, separately jitted and completion-forced: each level's decode scan, the
conditioner upsampling, and the VQ-VAE decoder — so optimization effort
targets the real bottleneck rather than the chain aggregate that bench.py
reports.

Usage: python scripts/profile_chain.py [batch]
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


def timeit(fn, *args, iters=20):
    from vae_music_tpu.utils.profiling import measure_rtt

    out = fn(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    rtt = measure_rtt()   # ~28 ms per host fetch on the tunneled backend
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    return (time.time() - t0 - rtt) / iters, out


def main():
    from vae_music_tpu.configs import get_config
    from vae_music_tpu.models.prior import get_cond
    from vae_music_tpu.sample.sampler import AncestralSampler

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    scfg = get_config("FULL_PIPELINE")
    # Match bench.py's serving configuration so the stage breakdown sums to
    # the headline chain time (bf16 caches AND bf16 conv stacks).
    sampler = AncestralSampler.from_config(scfg, jax.random.PRNGKey(0),
                                           cache_dtype="bfloat16",
                                           serve_dtype="bfloat16")
    vcfg = scfg.vqvae
    y = jnp.zeros((batch,), jnp.int32)
    rng = jax.random.PRNGKey(1)

    total = 0.0
    zs = [None] * sampler.levels
    for level in reversed(range(sampler.levels)):
        spec = sampler.specs[level]
        pcfg = sampler.prior_cfgs[level]

        x_cond = None
        if spec.cond_downsample_rate is not None:
            z_cond = get_cond(zs, spec, 0, spec.ctx_len)
            dt, x_cond = timeit(sampler._cond_upsampler(level),
                                sampler.prior_params[level], z_cond)
            print(f"level {level} conditioner upsample: {dt*1e3:8.2f} ms")
            total += dt

        y_cond = None
        if pcfg.genre_classes is not None:
            y_cond = sampler._label_embedder(level)(
                sampler.prior_params[level], y)

        decode_fn = sampler._decoder(level, batch)
        dt, tokens = timeit(decode_fn, sampler.prior_params[level],
                            jax.random.fold_in(rng, level), x_cond, y_cond)
        zs[level] = tokens[:, 1:]
        print(f"level {level} decode ({spec.ctx_len:4d} steps): {dt*1e3:8.2f} ms"
              f"  ({dt / spec.ctx_len * 1e6:6.1f} us/step)")
        total += dt

    dt, wav = timeit(sampler._vq_decoder(0), sampler.vqvae_params,
                     sampler.codebooks, zs[0])
    print(f"VQ-VAE decode:               {dt*1e3:8.2f} ms")
    total += dt
    print(f"sum of stages:               {total*1e3:8.2f} ms")

    chain = sampler.compile_chain(batch)
    dt, _ = timeit(chain, jax.random.PRNGKey(2), y)
    print(f"full fused chain:            {dt*1e3:8.2f} ms  "
          f"({batch * vcfg.sample_length / 3000 / dt:.0f} clips/s)")


if __name__ == "__main__":
    main()
