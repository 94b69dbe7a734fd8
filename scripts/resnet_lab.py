"""Fused dilated-resnet kernel vs XLA at the serving decoder geometry.

SURVEY.md §7 stage 3b / VERDICT r3 weak #7: the level-0 VQ conv decode is
11.10 ms of the 51.4 ms serving chain (docs/SERVING.md budget) and its
width-32 resnet stacks were the one hot path with neither a custom kernel
nor a recorded kernel failure.  This lab measures, per decoder stage shape
(batch 256, bf16 — the serving configuration):

  * XLA `DilatedResnet1D` with conv lowering (the current dispatch winner)
  * XLA with the tap-matmul rewrite (known loser below 256 channels)
  * the fused Pallas kernel (ops/resnet_pallas.py): whole stack on a VMEM
    tile, one HBM round trip instead of ~2L

plus the end-to-end level-0 decode stacks total.  Result is recorded in
docs/SERVING.md win or lose.

Usage: python scripts/resnet_lab.py [--batch 256]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

from vae_music_tpu.nn.resnet import DilatedResnet1D
from vae_music_tpu.ops.resnet_pallas import (
    fused_dilated_resnet,
    stack_resnet_params,
)

# Flagship level-0 decoder: down_depth 5, stride 2 -> resnet stacks run at
# these lengths (code grid 896 upsampled x2 per stage), width 32, depth 4,
# dilations reversed [27, 9, 3, 1] (configs/registry.py GTZAN_VQVAE).
STAGE_T = (896, 1792, 3584, 7168, 14336)
DEPTH = 4


def _rtt():
    null = jax.jit(lambda v: v + 1.0)
    x = null(jnp.float32(0))
    _ = float(x)
    best = float("inf")
    for _i in range(3):
        t0 = time.time()
        _ = float(null(x))
        best = min(best, time.time() - t0)
    return best


def time_fn(fn, x, iters, rtt):
    out = fn(x)
    _ = float(jnp.sum(out))  # compile + completion
    best = float("inf")
    for _rep in range(3):
        t0 = time.time()
        for _ in range(iters):
            out = fn(x)
        _ = float(jnp.sum(out))
        best = min(best, (time.time() - t0 - rtt) / iters)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--width", type=int, default=32,
                    help="channels (32 = flagship level-0 decoder)")
    ap.add_argument("--stages", type=int, nargs="*", default=None,
                    help="override stage lengths (default: level-0 decoder)")
    args = ap.parse_args()
    C = args.width
    stage_t = tuple(args.stages) if args.stages else STAGE_T

    rtt = _rtt()
    print(f"device={jax.devices()[0]} rtt={rtt*1e3:.1f}ms batch={args.batch} "
          f"width={C}", flush=True)

    mod_conv = DilatedResnet1D(C, DEPTH, dilation_factor=3,
                               reverse_dilation=True, dtype=jnp.bfloat16,
                               conv_impl="conv")
    mod_tap = DilatedResnet1D(C, DEPTH, dilation_factor=3,
                              reverse_dilation=True, dtype=jnp.bfloat16,
                              conv_impl="tap")
    dils = mod_conv.dilations()

    rows = []
    totals = {"xla_conv": 0.0, "xla_tap": 0.0, "pallas": 0.0}
    for t_len in stage_t:
        x = jax.random.normal(jax.random.PRNGKey(0), (args.batch, t_len, C),
                              jnp.bfloat16)
        params = mod_conv.init(jax.random.PRNGKey(1),
                               x.astype(jnp.float32))["params"]
        w0, b0, w1, b1 = stack_resnet_params(params, DEPTH)

        fns = {
            "xla_conv": jax.jit(lambda xx, p=params: mod_conv.apply(
                {"params": p}, xx)),
            "xla_tap": jax.jit(lambda xx, p=params: mod_tap.apply(
                {"params": p}, xx)),
            "pallas": jax.jit(lambda xx, a=w0, b=b0, cc=w1, d=b1:
                              fused_dilated_resnet(xx, a, b, cc, d, dils)),
        }
        # Fidelity vs the f32 conv stack before timing anything.
        ref = mod_conv.apply({"params": params}, x)
        got = fns["pallas"](x)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                    - ref.astype(jnp.float32))))

        iters = max(6, int(args.iters * stage_t[0] / t_len * 4))
        row = {"T": t_len, "max_abs_err_vs_xla": round(err, 4)}
        for name, fn in fns.items():
            us = time_fn(fn, x, iters, rtt) * 1e6
            row[f"{name}_us"] = round(us, 1)
            totals[name] += us
        row["pallas_speedup_vs_conv"] = round(
            row["xla_conv_us"] / row["pallas_us"], 2)
        rows.append(row)
        print(json.dumps(row), flush=True)

    summary = {
        "stage_totals_us": {k: round(v, 1) for k, v in totals.items()},
        "pallas_total_speedup_vs_conv": round(
            totals["xla_conv"] / totals["pallas"], 2),
        "note": "totals = sum over the 5 level-0 decoder resnet stages; the "
                "SERVING.md budget attributes 11.10 ms to the whole VQ conv "
                "decode (these stacks + 5 ConvTranspose + 2 boundary convs)",
    }
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
