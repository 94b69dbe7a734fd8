"""On-TPU wide-geometry fidelity: grid kernel vs XLA scan path (VERDICT r4
task 6 — the incremental==batch invariant of
/root/reference/src/transformer/factorized_attention.py:446-462, applied at
the geometry that matters: width 1024, depth 48, ctx 8192).

Greedy full-sequence token equality is CHAOTIC under quantized caches (one
argmax flip rewrites everything after it), so the comparison teacher-forces
both paths onto the SAME token stream via primed decode (prime_len = ctx-1)
and compares the per-position next-token argmax and logits — exactly the
reference invariant, position by position, with no divergence chaining.

Three comparisons, all on the trained wide artifact when present
(artifacts/soak_wide), else random init:
  1. grid f32 caches vs XLA f32 caches at ctx 2048 (both fit): logits must
     match to numerical tolerance — the exactness check.
  2. grid int8 caches + int8 weights vs XLA bf16 caches at FULL ctx 8192
     (the serving configs that actually fit): per-position argmax agreement.
  3. grid int4 caches at full ctx: same agreement metric (capacity mode).

Usage: python scripts/wide_fidelity.py [ctx_full]
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


def main():
    from vae_music_tpu.configs import get_config
    from vae_music_tpu.sample.decode import SampleMode, make_decode_fn
    from vae_music_tpu.train.prior_step import init_prior

    ctx_full = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    pcfg = get_config("JUKEBOX_CHAIN_TOP")
    vcfg = get_config("JUKEBOX_VQVAE")
    # The chain-top trains at ctx 1024; for the full-ctx fidelity run use the
    # benchmark geometry (ctx 8192 needs the trained transformer weights but
    # a long positional table -> fall back to the standalone config there).
    wcfg = get_config("JUKEBOX_SMALL_PRIOR")

    art = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts", "soak_wide")
    weights = "random-init"
    _, params_top = init_prior(jax.random.PRNGKey(1), vcfg, pcfg)
    if os.path.isdir(art):
        from vae_music_tpu.train.checkpoint import load_pipeline_artifact

        _vq, _cbs, pps = load_pipeline_artifact(art)
        params_top = pps[1]
        weights = "trained:artifacts/soak_wide"
    print(json.dumps({"weights": weights}), flush=True)

    def primed_argmax(pcfg_, prms, ctx, batch, prime, keep=16, **dkw):
        """Per-position argmax (host) + the on-device logits of the first
        ``keep`` samples kept as a device array (fetching full wide logits —
        (64, 8192, 1025) f32 = 2.1 GB — over the tunnel would dwarf the
        decode itself)."""
        fn = make_decode_fn(pcfg_, ctx, batch, mode=SampleMode.GREEDY,
                            prime_len=ctx - 1, return_logits=True, **dkw)
        toks, logits = fn(prms, jax.random.PRNGKey(3), None, None,
                          prime[:batch, :ctx - 1])
        return np.asarray(jnp.argmax(logits, -1)), logits[:keep]

    # Shared teacher-forcing stream.
    rng = np.random.default_rng(0)

    # --- 1. exactness at ctx 2048 (trained chain-top weights, ctx 1024
    #        table -> use its own ctx; grid vs XLA, both f32) ---------------
    ctx1 = 1024
    prime = jnp.asarray(rng.integers(0, pcfg.bins - 1, (64, ctx1 - 1)),
                        jnp.int32)
    am_g, lg_g = primed_argmax(pcfg, params_top, ctx1, 64, prime,
                               fused="grid")
    am_x, lg_x = primed_argmax(pcfg, params_top, ctx1, 64, prime,
                               fused=False)
    err = float(jnp.abs(lg_g - lg_x).max())
    rel = err / float(jnp.abs(lg_x).max())
    print(json.dumps({
        "check": "grid_f32_vs_xla_f32", "ctx": ctx1, "batch": 64,
        "logits_max_abs_err": round(err, 5), "rel": round(rel, 7),
        "argmax_agreement": float((am_g == am_x).mean()),
    }), flush=True)

    # --- 2/3. serving configs at full ctx (standalone wide geometry) ------
    _, params_w = init_prior(jax.random.PRNGKey(1), vcfg, wcfg)
    prime_w = jnp.asarray(rng.integers(0, wcfg.bins - 1, (64, ctx_full - 1)),
                          jnp.int32)
    am_ref, lg_ref = primed_argmax(wcfg, params_w, ctx_full, 16, prime_w,
                                   fused=False, cache_dtype="bfloat16")
    for name, dkw in (
        ("grid_int8cache_int8w", {"fused": "grid", "cache_dtype": "int8",
                                  "weight_dtype": "int8"}),
        ("grid_int4cache", {"fused": "grid", "cache_dtype": "int4",
                            "weight_dtype": "int8"}),
    ):
        t0 = time.time()
        am, lg = primed_argmax(wcfg, params_w, ctx_full, 64, prime_w, **dkw)
        agree = float((am[:16] == am_ref).mean())
        lerr = float(jnp.abs(lg - lg_ref).max())
        print(json.dumps({
            "check": f"{name}_vs_xla_bf16", "ctx": ctx_full,
            "argmax_agreement": round(agree, 5),
            "logits_max_abs_err": round(lerr, 3),
            "wall_s": round(time.time() - t0, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
