"""In-kernel sampler fidelity: hardware-PRNG Gumbel vs the XLA threefry path.

The serving fast path (ops/decode_pallas.fused_decode_step_sample) samples
with the TPU hardware PRNG inside the kernel; the XLA path uses
jax.random.categorical (threefry).  Both implement Gumbel-max over the same
logits — the reference's RelaxedOneHotCategorical(temp=1)+argmax
(/root/reference/src/autoregressive/autoregressive_fmha.py:217-221) — but
draw from different random streams, so the check is distributional: the
per-position empirical token distributions over many sampled sequences must
agree within the two-sample noise bound, with a greedy (RNG-free) run as the
exactness control.

Run on a real TPU: python scripts/sampling_distribution_check.py
Appends nothing; prints the numbers recorded in PARITY.md §4.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/vmt_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp
import numpy as np

from vae_music_tpu.configs import get_config
from vae_music_tpu.sample.decode import SampleMode, make_decode_fn
from vae_music_tpu.sample.sampler import AncestralSampler


def tv_per_position(tokens_a: np.ndarray, tokens_b: np.ndarray, bins: int):
    """Mean over positions of the total-variation distance between the
    empirical per-position token distributions of two (N, T) samples."""
    tvs = []
    for t in range(tokens_a.shape[1]):
        pa = np.bincount(tokens_a[:, t], minlength=bins) / tokens_a.shape[0]
        pb = np.bincount(tokens_b[:, t], minlength=bins) / tokens_b.shape[0]
        tvs.append(0.5 * np.abs(pa - pb).sum())
    return float(np.mean(tvs))


def main():
    batch = 512   # nh = 1024: fused kernel eligible; big N tightens the bound
    scfg = get_config("FULL_PIPELINE")
    sampler = AncestralSampler.from_config(scfg, jax.random.PRNGKey(0))
    level = 1                      # top prior (no conditioner: pure sampler)
    spec = sampler.specs[level]
    pcfg = sampler.prior_cfgs[level]
    params = sampler.prior_params[level]
    y_cond = sampler._label_embedder(level)(params,
                                            jnp.zeros((batch,), jnp.int32))

    def decode(mode, sik, key, top_k=0, top_p=1.0):
        fn = make_decode_fn(pcfg, spec.ctx_len, batch, mode=mode, top_k=top_k,
                            top_p=top_p, cache_dtype="bfloat16",
                            sample_in_kernel=sik)
        return np.asarray(fn(params, key, None, y_cond))[:, 1:]

    # 1) Greedy is RNG-free: kernel sampling must be token-exact vs XLA.
    g_xla = decode(SampleMode.GREEDY, False, jax.random.PRNGKey(1))
    g_krn = decode(SampleMode.GREEDY, True, jax.random.PRNGKey(1))
    greedy_equal = bool((g_xla == g_krn).all())
    print(f"greedy token-exact (kernel vs XLA): {greedy_equal}")

    # 2) Gumbel: distributional comparison + two-sample noise bound.
    x1 = decode(SampleMode.GUMBEL, False, jax.random.PRNGKey(2))
    x2 = decode(SampleMode.GUMBEL, False, jax.random.PRNGKey(3))
    k1 = decode(SampleMode.GUMBEL, True, jax.random.PRNGKey(4))
    noise = tv_per_position(x1, x2, pcfg.bins)          # threefry vs threefry
    cross = tv_per_position(x1, k1, pcfg.bins)          # threefry vs hw-PRNG
    print(f"mean per-position TV, xla-vs-xla (noise bound): {noise:.4f}")
    print(f"mean per-position TV, kernel-vs-xla:            {cross:.4f}")
    assert greedy_equal
    assert cross < 1.5 * noise + 0.02, (cross, noise)

    # 3) Top-k (r3 in-kernel threshold bisection): distributional comparison
    #    vs the XLA sort-based top-k fallback.
    t1 = decode(SampleMode.TOP_K, False, jax.random.PRNGKey(5), top_k=50)
    t2 = decode(SampleMode.TOP_K, False, jax.random.PRNGKey(6), top_k=50)
    tk = decode(SampleMode.TOP_K, True, jax.random.PRNGKey(7), top_k=50)
    tk_noise = tv_per_position(t1, t2, pcfg.bins)
    tk_cross = tv_per_position(t1, tk, pcfg.bins)
    print(f"top-k=50 TV, xla-vs-xla (noise bound): {tk_noise:.4f}")
    print(f"top-k=50 TV, kernel-vs-xla:            {tk_cross:.4f}")
    assert tk_cross < 1.5 * tk_noise + 0.02, (tk_cross, tk_noise)

    # 4) Top-p (r3 in-kernel probability-mass bisection): distributional
    #    comparison vs the XLA sort+cumsum nucleus fallback.
    p1 = decode(SampleMode.TOP_P, False, jax.random.PRNGKey(8), top_p=0.92)
    p2 = decode(SampleMode.TOP_P, False, jax.random.PRNGKey(9), top_p=0.92)
    pk = decode(SampleMode.TOP_P, True, jax.random.PRNGKey(10), top_p=0.92)
    tp_noise = tv_per_position(p1, p2, pcfg.bins)
    tp_cross = tv_per_position(p1, pk, pcfg.bins)
    print(f"top-p=.92 TV, xla-vs-xla (noise bound): {tp_noise:.4f}")
    print(f"top-p=.92 TV, kernel-vs-xla:            {tp_cross:.4f}")
    assert tp_cross < 1.5 * tp_noise + 0.02, (tp_cross, tp_noise)
    print("PASS: in-kernel sampling matches the threefry path in distribution"
          " (gumbel + top-k + top-p)")


if __name__ == "__main__":
    main()
