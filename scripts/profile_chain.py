"""Break the ancestral-chain wall time into its stages (TPU timing aid).

Times, separately jitted and completion-forced: each level's decode scan, the
conditioner upsampling, and the VQ-VAE decoder — so optimization effort
targets the real bottleneck rather than the chain aggregate that bench.py
reports.

r5 (VERDICT r4 task 4): each stage also gets XLA's own cost analysis (flops
+ bytes accessed), so the table assigns BYTES per stage and a per-stage
HBM-BW utilization / MFU — the roofline from which "the chain's 52% HBM
utilization is (or is not) the op-mix ceiling" can be read off directly.

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


V5E_PEAK_BF16_FLOPS = 197e12
V5E_HBM_BW = 819e9


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


def stage_cost(fn, *args):
    """XLA cost analysis (flops, bytes accessed) of a jitted stage."""
    try:
        ca = fn.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        bts = sum(v for k, v in ca.items()
                  if isinstance(v, (int, float)) and "bytes accessed" in k)
        return flops, float(bts)
    except Exception:
        return None, None


_ROWS = []


def report(name, dt, flops, bts):
    util = bts / dt / V5E_HBM_BW if bts else None
    mfu = flops / dt / V5E_PEAK_BF16_FLOPS if flops else None
    _ROWS.append((name, dt, flops, bts, util, mfu))
    print(f"{name:38s} {dt*1e3:8.2f} ms"
          + (f"  {bts/2**20:9.1f} MB  BW {util*100:5.1f}%" if bts else "")
          + (f"  MFU {mfu*100:5.2f}%" if flops else ""))


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
            up = sampler._cond_upsampler(level)
            dt, x_cond = timeit(up, sampler.prior_params[level], z_cond)
            report(f"level {level} conditioner upsample",
                   dt, *stage_cost(up, sampler.prior_params[level], z_cond))
            total += dt

        y_cond = None
        if pcfg.genre_classes is not None:
            y_cond = sampler._label_embedder(level)(
                sampler.prior_params[level], y)

        decode_fn = sampler._decoder(level, batch)
        dt, tokens = timeit(decode_fn, sampler.prior_params[level],
                            jax.random.fold_in(rng, level), x_cond, y_cond)
        zs[level] = tokens[:, 1:]
        report(f"level {level} decode ({spec.ctx_len} steps, "
               f"{dt / spec.ctx_len * 1e6:.1f} us/step)",
               dt, *stage_cost(decode_fn, sampler.prior_params[level],
                               jax.random.fold_in(rng, level), x_cond,
                               y_cond))
        total += dt

    dec = sampler._vq_decoder(0)
    dt, wav = timeit(dec, sampler.vqvae_params, sampler.codebooks, zs[0])
    report("VQ-VAE decode", dt,
           *stage_cost(dec, sampler.vqvae_params, sampler.codebooks, zs[0]))
    total += dt
    print(f"{'sum of stages':38s} {total*1e3:8.2f} ms")

    chain = sampler.compile_chain(batch)
    dt, _ = timeit(chain, jax.random.PRNGKey(2), y)
    report(f"full fused chain ({batch * vcfg.sample_length / 3000 / dt:.0f} "
           "clips/s)", dt,
           *stage_cost(chain, jax.random.PRNGKey(2), y))

    # Roofline summary: per stage, the nearer of the two ceilings and the
    # distance to it — the stage furthest under BOTH ceilings is the only
    # place remaining chain time could hide.
    print("\nper-stage roofline position (ceiling = max(BW-bound, MXU-bound"
          " time)):")
    for name, dt, flops, bts, util, mfu in _ROWS:
        if bts is None:
            continue
        floor = max(bts / V5E_HBM_BW,
                    (flops or 0.0) / V5E_PEAK_BF16_FLOPS)
        print(f"  {name:36s} measured {dt*1e3:7.2f} ms  floor "
              f"{floor*1e3:7.2f} ms  at {floor/dt*100:5.1f}% of ceiling")


if __name__ == "__main__":
    main()
