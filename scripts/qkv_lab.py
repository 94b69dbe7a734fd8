"""QKV causal-conv lab: nn.Conv vs TapConv3 at the Jukebox training shape.

The k=3 causal QKV conv (width 1024 -> 768) is ~half the per-layer matmul
FLOPs of the JUKEBOX_SMALL_* transformer; this measures whether the tap
formulation beats XLA's conv lowering there, fwd and fwd+bwd, with repeats
to bound run-to-run variance on the tunneled device.

Also re-measures the conv_lab jukebox-conditioner geometry 3x (run-to-run
variance there spanned 6.3-12.9 ms for the identical executable).

Usage: python scripts/qkv_lab.py
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

import flax.linen as nn
import jax.numpy as jnp

from vae_music_tpu.nn.resnet import DilatedResnet1D, TapConv3


def bench(fn, *args, iters=20, reps=5):
    out = fn(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    times = []
    for _rep in range(reps):
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
        times.append((time.time() - t0) / iters)
    return min(times), max(times)


def qkv_shape(batch=4, t=8192, cin=1024, cout=768, dtype=jnp.bfloat16):
    print(f"== qkv causal conv ({batch}x{t}, {cin}->{cout}, {dtype.__name__}) ==",
          flush=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (batch, t, cin), dtype)
    conv = nn.Conv(cout, (3,), padding="CAUSAL", dtype=dtype)
    tap = TapConv3(cout, padding="CAUSAL", dtype=dtype)
    p = conv.init(jax.random.PRNGKey(1), x)
    flops = 2 * batch * t * 3 * cin * cout

    for name, mod in (("conv", conv), ("tap", tap)):
        f = jax.jit(lambda pp, xx, m=mod: m.apply(pp, xx))
        lo, hi = bench(f, p, x)
        print(f"  fwd  {name:5s} {lo*1e3:7.2f}-{hi*1e3:7.2f} ms "
              f"{flops/lo/1e12:6.1f} TF/s", flush=True)

    # concat form: one (T, 3C) x (3C, C') matmul (conv_lab variant E —
    # 1.9x at width 32; parity at width 512)
    def concat_tap(pp, xx):
        kern = pp["params"]["kernel"].astype(dtype)
        bias = pp["params"]["bias"]
        pad = jnp.pad(xx, ((0, 0), (2, 0), (0, 0)))
        tc = jnp.concatenate([pad[:, :t], pad[:, 1:t + 1], xx], axis=-1)
        kc = jnp.concatenate([kern[0], kern[1], kern[2]], axis=0)
        return (jnp.dot(tc, kc, preferred_element_type=jnp.float32)
                + bias).astype(dtype)

    f = jax.jit(concat_tap)
    lo, hi = bench(f, p, x)
    print(f"  fwd  cat   {lo*1e3:7.2f}-{hi*1e3:7.2f} ms "
          f"{flops/lo/1e12:6.1f} TF/s", flush=True)

    for name, mod in (("conv", conv), ("tap", tap)):
        def loss(pp, xx, m=mod):
            return jnp.sum(m.apply(pp, xx).astype(jnp.float32) ** 2)

        g = jax.jit(jax.grad(loss))
        lo, hi = bench(g, p, x)
        print(f"  f+b  {name:5s} {lo*1e3:7.2f}-{hi*1e3:7.2f} ms "
              f"{3*flops/lo/1e12:6.1f} TF/s", flush=True)

    def loss_cat(pp, xx):
        return jnp.sum(concat_tap(pp, xx).astype(jnp.float32) ** 2)

    g = jax.jit(jax.grad(loss_cat))
    lo, hi = bench(g, p, x)
    print(f"  f+b  cat   {lo*1e3:7.2f}-{hi*1e3:7.2f} ms "
          f"{3*flops/lo/1e12:6.1f} TF/s", flush=True)


def conditioner_variance():
    print("== jukebox-conditioner resnet, conv vs tap, 3 repeats ==", flush=True)
    kw = dict(input_dim=512, depth=16, dilation_factor=3, dilation_cycle=8,
              dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8192, 512), jnp.bfloat16)
    conv = DilatedResnet1D(conv_impl="conv", **kw)
    tap = DilatedResnet1D(conv_impl="tap", **kw)
    p = conv.init(jax.random.PRNGKey(1), x)
    for name, mod in (("conv", conv), ("tap", tap)):
        f = jax.jit(lambda pp, xx, m=mod: m.apply(pp, xx))
        lo, hi = bench(f, p, x, reps=6)
        print(f"  fwd {name:5s} {lo*1e3:7.2f}-{hi*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    qkv_shape()
    conditioner_variance()
