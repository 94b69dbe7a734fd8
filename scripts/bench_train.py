"""Training-throughput benchmark: tokens/s + MFU for the Jukebox-scale priors.

Reproduces the README's training rows on one chip — the SMALL_PRIOR /
SMALL_UPSAMPLER architecture dumps (/root/reference/SMALL_PRIOR_model_structuree:2,
SMALL_UPSAMPLER_model_structure:2) give the geometry; the reference itself
never trains at this scale (TF/CPU).  Prints one JSON line per config:

    {"config": ..., "step_ms": ..., "tokens_per_sec": ..., "mfu": ...,
     "params_m": ..., "batch": ...}

MFU uses XLA's own cost analysis of the compiled step over the v5e bf16 MXU
peak (197 TFLOP/s), i.e. it counts the rematerialized forward — the honest
hardware-utilization number, not the 6ND approximation.

Usage: python scripts/bench_train.py [JUKEBOX_SMALL_PRIOR ...]
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
import numpy as np

V5E_PEAK_BF16_FLOPS = 197e12

# (vqvae config, batch) per prior config; batches chosen to fit 16GB HBM
# with bf16+remat.
SETUPS = {
    "JUKEBOX_SMALL_PRIOR": ("JUKEBOX_VQVAE", 4),
    "JUKEBOX_SMALL_UPSAMPLER": ("JUKEBOX_VQVAE", 2),
    "SMALL_PRIOR": ("GTZAN_VQVAE", 32),
}


def bench_one(name: str, iters: int = 5):
    from vae_music_tpu.configs import get_config
    from vae_music_tpu.models.vqvae import init_vqvae
    from vae_music_tpu.train.prior_step import (
        default_prior_optimizer, init_prior, make_prior_train_step)
    from vae_music_tpu.train.state import PriorTrainState

    vq_name, batch = SETUPS[name]
    vcfg = get_config(vq_name)
    pcfg = get_config(name)
    vq_params, cbs = init_vqvae(jax.random.PRNGKey(0), vcfg)
    _, params = init_prior(jax.random.PRNGKey(1), vcfg, pcfg)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))

    state = PriorTrainState.create(params, default_prior_optimizer(pcfg))
    step = make_prior_train_step(vcfg, pcfg, vq_params, cbs)
    labels = (jnp.zeros((batch,), jnp.int32)
              if pcfg.genre_classes is not None else None)
    audio = jax.random.normal(jax.random.PRNGKey(2),
                              (batch, vcfg.sample_length, 1)) * 0.1
    rng = jax.random.PRNGKey(3)

    lowered = step.lower(state, audio, labels, rng)
    compiled = lowered.compile()
    flops = None
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0)) or None
    except Exception:
        pass

    from vae_music_tpu.utils.profiling import measure_rtt

    state, m = step(state, audio, labels, rng)
    _ = float(m["loss"])   # forced completion (tunnel-safe)
    rtt = measure_rtt()
    t0 = time.time()
    for _ in range(iters):
        state, m = step(state, audio, labels, rng)
    _ = float(m["loss"])
    dt = (time.time() - t0 - rtt) / iters

    tokens = batch * get_tokens(vcfg, pcfg)
    return {
        "config": name,
        "params_m": round(n_params / 1e6, 1),
        "batch": batch,
        "ctx": get_tokens(vcfg, pcfg),
        "step_ms": round(dt * 1e3, 1),
        "tokens_per_sec": round(tokens / dt),
        "mfu": round(flops / dt / V5E_PEAK_BF16_FLOPS, 4) if flops else None,
        "step_tflops": round(flops / 1e12, 2) if flops else None,
    }


def get_tokens(vcfg, pcfg):
    from vae_music_tpu.models.prior import level_spec

    return level_spec(vcfg, pcfg.level).ctx_len


if __name__ == "__main__":
    names = sys.argv[1:] or ["JUKEBOX_SMALL_PRIOR", "JUKEBOX_SMALL_UPSAMPLER"]
    for nm in names:
        print(json.dumps(bench_one(nm)))
