"""Layer-grid decode kernel perf lab (ops/decode_grid_pallas.py).

Sweeps the history chunk size at the JUKEBOX_SMALL_PRIOR serving geometry
(width 1024, depth 48, ctx 8192, batch 64, int8 caches, bf16 weights) and
measures the grid kernel at the flagship level-0 decode geometry for the
grid-vs-unrolled dispatch record.

Usage: python scripts/grid_lab.py [wide|flagship] [chunks...]
Each (geometry, chunk) variant is a separate ~1-2 min compile (the grid
program is O(1) in depth); results print as JSON rows.
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


def _measure(fn, params, ctx, batch, rtt):
    out = fn(params, jax.random.PRNGKey(7), None, None)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    best = float("inf")
    for _rep in range(2):
        t0 = time.time()
        for _ in range(2):
            out = fn(params, jax.random.PRNGKey(7), None, None)
        _ = float(jnp.sum(out.astype(jnp.float32)))
        best = min(best, (time.time() - t0 - rtt) / 2)
    return {"us_per_step": round(best / ctx * 1e6, 1),
            "tokens_per_sec": round(batch / best * ctx)}


def main():
    from vae_music_tpu.configs import get_config
    from vae_music_tpu.sample.decode import SampleMode, make_decode_fn
    from vae_music_tpu.train.prior_step import init_prior
    from vae_music_tpu.utils.profiling import measure_rtt

    mode = sys.argv[1] if len(sys.argv) > 1 else "wide"
    chunks = [int(a) for a in sys.argv[2:]] or ([0, 256, 512]
                                                if mode == "wide" else [0])
    rtt = measure_rtt()
    print(f"rtt {rtt*1e3:.1f} ms; mode {mode}", flush=True)

    if mode == "roofline":
        # VERDICT r4 task 2: bytes-per-step account + measured utilization
        # for the wide grid kernel, with a ctx sweep separating the fixed
        # per-step cost (weight stream + writes + dispatch) from the
        # history-proportional cost: step_us ~= fixed + slope * hist_mb.
        from vae_music_tpu.ops.decode_grid_pallas import (
            grid_decode_chunk, grid_step_byte_account)

        pcfg = get_config("JUKEBOX_SMALL_PRIOR")
        vcfg = get_config("JUKEBOX_VQVAE")
        batch = 64
        nh = batch * pcfg.heads
        hd = pcfg.attn_width // pcfg.heads
        patterns = tuple(pcfg.attn_pattern(i) for i in range(pcfg.depth))
        _, params = init_prior(jax.random.PRNGKey(1), vcfg, pcfg)
        pts = []
        for ctx in (512, 2048, 8192):
            bl = ctx // pcfg.blocks
            chunk = grid_decode_chunk(bl, hd, nh, 1)
            acct = grid_step_byte_account(
                pcfg.depth, batch, pcfg.heads, hd, pcfg.width, pcfg.blocks,
                bl, chunk, "int8", "bfloat16", patterns)
            row = {"ctx": ctx, "block_len": bl, "chunk": chunk, **acct}
            try:
                fn = make_decode_fn(pcfg, ctx, batch, mode=SampleMode.GUMBEL,
                                    fused="grid", cache_dtype="int8",
                                    weight_dtype="bfloat16")
                m = _measure(fn, params, ctx, batch, rtt)
                row.update(m)
                row["hbm_bw_utilization"] = round(
                    acct["total_mb"] * 2**20
                    / (m["us_per_step"] * 1e-6) / 819e9, 3)
                hist_mb = (acct["hist_row_mb"] + acct["hist_prev_row_mb"]
                           + acct["hist_col_mb"])
                pts.append((hist_mb, m["us_per_step"]))
            except Exception as e:
                row["wall"] = f"{type(e).__name__}: {str(e)[:160]}"
            print(json.dumps(row), flush=True)
        if len(pts) >= 2:
            (x0, y0), (x1, y1) = pts[0], pts[-1]
            slope = (y1 - y0) / (x1 - x0)              # us per history MB
            fixed = y0 - slope * x0
            print(json.dumps({
                "fit_fixed_us": round(fixed, 1),
                "fit_hist_us_per_mb": round(slope, 3),
                "hist_effective_gbs": round(2**20 / (slope * 1e-6) / 1e9, 1),
                "note": "fixed ~ weight stream + writes + dispatch; "
                        "hist_effective_gbs vs 819 peak",
            }), flush=True)
        return

    if mode == "wide":
        pcfg = get_config("JUKEBOX_SMALL_PRIOR")
        vcfg = get_config("JUKEBOX_VQVAE")
        ctx, batch, level = vcfg.z_lengths[0], 64, 1
        dkw = {"cache_dtype": "int8", "weight_dtype": "bfloat16"}
    else:
        scfg = get_config("FULL_PIPELINE")
        vcfg = scfg.vqvae
        pcfg = scfg.prior_config(0)
        from vae_music_tpu.models.prior import level_spec

        ctx, batch, level = level_spec(vcfg, 0).ctx_len, 256, 0
        dkw = {"cache_dtype": "bfloat16"}
    _, params = init_prior(jax.random.PRNGKey(1), vcfg, pcfg)
    print(f"ctx {ctx} batch {batch} {dkw}", flush=True)

    for chunk in chunks:
        row = {"chunk": chunk, **dkw}
        try:
            fn = make_decode_fn(pcfg, ctx, batch, mode=SampleMode.GUMBEL,
                                fused="grid", grid_chunk=chunk, **dkw)
            t0 = time.time()
            row.update(_measure(fn, params, ctx, batch, rtt))
            row["compile_plus_measure_s"] = round(time.time() - t0, 1)
        except Exception as e:
            row["wall"] = f"{type(e).__name__}: {str(e)[:160]}"
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
