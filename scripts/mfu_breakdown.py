"""Where do the Jukebox-scale training milliseconds go? (VERDICT r2 #7)

Decomposes the JUKEBOX_SMALL_PRIOR / JUKEBOX_SMALL_UPSAMPLER train step into
separately-jitted sub-programs and times each with forced completion, so the
"other ~65%" of the 34-35% MFU number gets named.  Each row reports wall
time, XLA-cost-model FLOPs, and achieved TFLOP/s (how well that piece maps
to the MXU), plus the HBM-bytes estimate for roofline context.

Pieces:
  * full train step       — the production number (fwd x2 + bwd + adam)
  * fwd+bwd (no update)   — isolates the optimizer/EMA tail
  * forward only          — the fwd:bwd ratio
  * vqvae encode          — frozen tokenizer (conv stack, f32)
  * conditioner upsample  — the dilated transposed-conv stack (upsampler)
  * transformer-only fwd  — prior forward fed a precomputed cond stream

Usage: python scripts/mfu_breakdown.py [JUKEBOX_SMALL_PRIOR ...]
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
V5E_HBM_BW = 819e9

SETUPS = {
    "JUKEBOX_SMALL_PRIOR": ("JUKEBOX_VQVAE", 4),
    "JUKEBOX_SMALL_UPSAMPLER": ("JUKEBOX_VQVAE", 2),
}


def _cost(compiled):
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        byts = sum(v for k, v in ca.items()
                   if isinstance(v, (int, float)) and "bytes accessed" in k)
        return flops, float(byts)
    except Exception:
        return None, None


def _time(fn, *args, iters=5):
    out = fn(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    best = float("inf")
    for _rep in range(3):
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
        best = min(best, (time.time() - t0) / iters)
    return best


def report(name, dt, compiled=None):
    flops, byts = _cost(compiled) if compiled is not None else (None, None)
    row = {"piece": name, "ms": round(dt * 1e3, 1)}
    if flops:
        row["tflops_per_s"] = round(flops / dt / 1e12, 1)
        row["mfu"] = round(flops / dt / V5E_PEAK_BF16_FLOPS, 3)
    if byts:
        row["hbm_gb"] = round(byts / 1e9, 2)
        row["hbm_bw_util"] = round(byts / dt / V5E_HBM_BW, 3)
    print(json.dumps(row), flush=True)
    return row


def breakdown(name: str):
    from vae_music_tpu.configs import get_config
    from vae_music_tpu.models.prior import (
        FMHAPrior,
        build_fmha_prior,
        shift_right_with_start,
        token_loss,
    )
    from vae_music_tpu.models.vqvae import init_vqvae, vqvae_encode
    from vae_music_tpu.train.prior_step import (
        default_prior_optimizer,
        init_prior,
        make_prior_train_step,
    )
    from vae_music_tpu.train.state import PriorTrainState

    vq_name, batch = SETUPS[name]
    vcfg = get_config(vq_name)
    pcfg = get_config(name)
    print(f"== {name} (batch {batch}) ==", flush=True)
    vq_params, cbs = init_vqvae(jax.random.PRNGKey(0), vcfg)
    model, params = init_prior(jax.random.PRNGKey(1), vcfg, pcfg)
    print("  init done", flush=True)

    audio = jax.random.normal(jax.random.PRNGKey(2),
                              (batch, vcfg.sample_length, 1)) * 0.1
    labels = (jnp.zeros((batch,), jnp.int32)
              if pcfg.genre_classes is not None else None)
    rng = jax.random.PRNGKey(3)
    conditioned = pcfg.conditioner is not None
    level, levels = pcfg.level, vcfg.levels
    start_token = pcfg.bins - 1

    # full step
    state = PriorTrainState.create(params, default_prior_optimizer(pcfg))
    step = make_prior_train_step(vcfg, pcfg, vq_params, cbs, donate=False)
    comp = step.lower(state, audio, labels, rng).compile()
    dt_full = _time(lambda: step(state, audio, labels, rng)[1]["loss"])
    report("train_step_full", dt_full, comp)

    # encode only
    enc = jax.jit(lambda a: [z.sum() for z in vqvae_encode(
        vq_params, cbs, vcfg, a, level, levels)])
    report("vqvae_encode", _time(enc, audio),
           enc.lower(audio).compile())

    zs = vqvae_encode(vq_params, cbs, vcfg, audio, level, levels)
    codes = zs[0]
    tokens = shift_right_with_start(codes, start_token)
    upper = zs[1] if conditioned else None

    # conditioner upsample only
    if conditioned:
        cond = jax.jit(lambda p, z: model.apply(
            p, z, method=FMHAPrior.upsample_cond))
        report("conditioner_upsample", _time(cond, params, upper),
               cond.lower(params, upper).compile())
        stream = cond(params, upper)
    else:
        stream = None

    # forward with precomputed stream (transformer + embed + head only)
    fwd_tf = jax.jit(lambda p, tok, s: model.apply(
        p, tok, s, None, train=False)[0].sum())
    report("forward_transformer_only", _time(fwd_tf, params, tokens, stream),
           fwd_tf.lower(params, tokens, stream).compile())

    # full forward (incl. conditioner) loss
    def loss_fn(p):
        logits, _ = model.apply(p, tokens, upper, None, train=False)
        return token_loss(codes, logits)

    fwd = jax.jit(loss_fn)
    report("forward_full", _time(fwd, params),
           fwd.lower(params).compile())

    # fwd+bwd — keep the grads live (returning only the loss would let XLA
    # dead-code-eliminate the whole backward pass)
    def fb_fn(p):
        v, g = jax.value_and_grad(loss_fn)(p)
        return v, jax.tree_util.tree_map(jnp.sum, g)

    fb = jax.jit(fb_fn)
    report("forward_backward", _time(fb, params),
           fb.lower(params).compile())


if __name__ == "__main__":
    names = sys.argv[1:] or ["JUKEBOX_SMALL_PRIOR", "JUKEBOX_SMALL_UPSAMPLER"]
    for nm in names:
        breakdown(nm)
