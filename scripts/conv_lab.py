"""Dilated-conv residual-block experiment (SURVEY §7 stage 3b, VERDICT r2 #7).

The conv-heavy paths — the VQ-VAE encoder/decoder and the upsampler's
dilated ConditionerNet stack — set the encode-throughput and part of the
282M-upsampler-MFU ceilings.  This lab measures, at both the flagship
encode geometry (width 32) and the Jukebox upsampler geometry (width 512):

  A. XLA `nn.Conv` dilated residual block (production path)
  B. tap-matmul formulation: Conv1D(k=3, dilation d) rewritten as three
     shifted (T, C) x (C, C') matmuls — no conv lowering, pure MXU
  C. B with bf16 inputs / f32 accumulation

to decide whether a custom lowering beats XLA's conv handling — and
records the result win-or-lose (the flash-attention note at
nn/attention.py:55-61 is the model).

Usage: python scripts/conv_lab.py
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
import numpy as np

from vae_music_tpu.nn.resnet import DilatedResnet1D


def tap_matmul_resnet(params, x, *, depth, dilation_factor, dilation_cycle,
                      width, compute_dtype=jnp.float32, precision=None,
                      concat=False):
    """DilatedResnet1D forward with every Conv1D(k=3) expressed as three
    shifted matmuls ('SAME' centered padding like nn.Conv uses).

    Matches nn/resnet.py's block: relu -> conv(k3, dil) -> relu -> conv(k3,1)
    -> + x  (reference resnet.py:11-29).
    """
    h = x
    for d in range(depth):
        dil = dilation_factor ** (d % dilation_cycle if dilation_cycle
                                  is not None else d)
        blk = params[f"ResnetConv1DBlock_{d}"]

        def conv3(t, kernel, bias, dil):
            # kernel: (3, Cin, Cout); SAME padding => taps at -dil, 0, +dil
            k0, k1, k2 = kernel[0], kernel[1], kernel[2]
            cd = compute_dtype
            pad = jnp.zeros((t.shape[0], dil, t.shape[2]), t.dtype)
            tm = jnp.concatenate([pad, t[:, :-dil]], axis=1)
            tp = jnp.concatenate([t[:, dil:], pad], axis=1)
            if concat:
                # one (T, 3C) x (3C, C') matmul instead of three
                tc = jnp.concatenate([tm, t, tp], axis=-1).astype(cd)
                kc = jnp.concatenate([k0, k1, k2], axis=0).astype(cd)
                out = jnp.dot(tc, kc, precision=precision,
                              preferred_element_type=jnp.float32)
                return out + bias
            out = (jnp.dot(tm.astype(cd), k0.astype(cd), precision=precision,
                           preferred_element_type=jnp.float32)
                   + jnp.dot(t.astype(cd), k1.astype(cd), precision=precision,
                             preferred_element_type=jnp.float32)
                   + jnp.dot(tp.astype(cd), k2.astype(cd), precision=precision,
                             preferred_element_type=jnp.float32))
            return out + bias

        u = jax.nn.relu(h)
        c1 = conv3(u, blk["Conv_0"]["kernel"], blk["Conv_0"]["bias"], dil)
        c2 = conv3(jax.nn.relu(c1), blk["Conv_1"]["kernel"],
                   blk["Conv_1"]["bias"], 1)
        h = h + c2.astype(h.dtype)
    return h


def bench(fn, *args, iters=20):
    out = fn(*args)
    _ = float(jnp.sum(out))
    best = float("inf")
    for _rep in range(3):
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        _ = float(jnp.sum(out))
        best = min(best, (time.time() - t0) / iters)
    return best


def run_geometry(tag, n, t, width, depth, cycle, dtype):
    print(f"== {tag}: batch {n}, T {t}, width {width}, depth {depth}, "
          f"cycle {cycle}, {dtype} ==", flush=True)
    model = DilatedResnet1D(input_dim=width, depth=depth, dilation_factor=3,
                            dilation_cycle=cycle, dtype=jnp.dtype(dtype))
    x = jax.random.normal(jax.random.PRNGKey(0), (n, t, width),
                          jnp.dtype(dtype))
    params = model.init(jax.random.PRNGKey(1), x)["params"]

    xla = jax.jit(lambda p, xx: model.apply({"params": p}, xx))
    dt_a = bench(xla, params, x)

    flops = depth * 2 * 2 * n * t * 3 * width * width  # 2 convs x k=3
    tap = jax.jit(lambda p, xx: tap_matmul_resnet(
        p, xx, depth=depth, dilation_factor=3, dilation_cycle=cycle,
        width=width))
    ref = xla(params, x)
    got = tap(params, x)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                - got.astype(jnp.float32))))
    dt_b = bench(tap, params, x)

    tap16 = jax.jit(lambda p, xx: tap_matmul_resnet(
        p, xx, depth=depth, dilation_factor=3, dilation_cycle=cycle,
        width=width, compute_dtype=jnp.bfloat16))
    dt_c = bench(tap16, params, x)

    # D: exact-f32 taps (precision HIGHEST) — decides whether the f32 encode
    # path can switch to taps without the default bf16-dot numerics drift.
    tap_hi = jax.jit(lambda p, xx: tap_matmul_resnet(
        p, xx, depth=depth, dilation_factor=3, dilation_cycle=cycle,
        width=width, precision=jax.lax.Precision.HIGHEST))
    err_hi = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                   - tap_hi(params, x).astype(jnp.float32))))
    dt_d = bench(tap_hi, params, x)

    # E: single concatenated (T,3C)x(3C,C') matmul per conv
    tap_cat = jax.jit(lambda p, xx: tap_matmul_resnet(
        p, xx, depth=depth, dilation_factor=3, dilation_cycle=cycle,
        width=width, compute_dtype=(jnp.bfloat16 if dtype == "bfloat16"
                                    else jnp.float32), concat=True))
    dt_e = bench(tap_cat, params, x)

    for nm, dt in (("A_xla_conv", dt_a), ("B_tap_matmul", dt_b),
                   ("C_tap_bf16", dt_c), ("D_tap_f32_hi", dt_d),
                   ("E_tap_concat", dt_e)):
        print(f"  {nm:14s} {dt*1e3:8.2f} ms  {flops/dt/1e12:6.1f} TF/s",
              flush=True)
    print(f"  B-vs-A max err {err:.2e}  D-vs-A max err {err_hi:.2e}", flush=True)
    print(f"  speedup B {dt_a/dt_b:.2f}x  C {dt_a/dt_c:.2f}x  "
          f"D {dt_a/dt_d:.2f}x  E {dt_a/dt_e:.2f}x", flush=True)


if __name__ == "__main__":
    # flagship encode geometry: level-0 resnets, width 32, long T
    run_geometry("flagship-encoder", 32, 28672 // 2, 32, 4, None, "float32")
    # Jukebox upsampler conditioner stage: width 512, deep dilation cycle
    run_geometry("jukebox-conditioner", 2, 8192, 512, 16, 8, "bfloat16")
