"""Measure the TF/CPU reference's end-to-end throughput (the BASELINE denominator).

The reference publishes no numbers (README is a stub, no timing code —
SURVEY.md §6), so we run the reference code itself at the flagship geometry
and record:
  * generation: audio-seconds generated per wall second via
    ``VQVAESampler.sample`` + ``VQVAE.decode`` (Sampler.py:72-109, vqvae.py:253)
  * encode: codebook tokens per wall second via ``VQVAE.encode`` (vqvae.py:221)

The reference imports tensorflow_addons / tensorflow_probability / librosa /
sklearn at module top but (on these paths) uses only
``tfp.distributions.RelaxedOneHotCategorical``; the missing modules are
stubbed with timing-neutral equivalents so the measured cost is the
reference's own compute.

Writes baselines/tf_cpu.json.  Run ONCE:  python scripts/measure_tf_baseline.py
"""

import json
import os
import sys
import time
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"

# ---------------------------------------------------------------------------
# Stub the reference's unused-at-runtime imports.
# ---------------------------------------------------------------------------
os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")  # reference is Keras-2 era code

import numpy as np
import tensorflow as tf

tfa = types.ModuleType("tensorflow_addons")
sys.modules["tensorflow_addons"] = tfa

librosa = types.ModuleType("librosa")
librosa.load = lambda *a, **k: (_ for _ in ()).throw(RuntimeError("no audio IO in bench"))
librosa_display = types.ModuleType("librosa.display")
librosa.display = librosa_display
sys.modules["librosa"] = librosa
sys.modules["librosa.display"] = librosa_display


class _RelaxedOneHotCategorical:
    """Timing-neutral Gumbel-softmax stand-in for tfp's distribution
    (used at autoregressive_fmha.py:218-221 as sample()->argmax)."""

    def __init__(self, temperature, logits):
        self.temperature = temperature
        self.logits = logits

    def sample(self):
        u = tf.random.uniform(tf.shape(self.logits), minval=1e-9, maxval=1.0)
        g = -tf.math.log(-tf.math.log(u))
        return tf.nn.softmax((self.logits + g) / self.temperature, axis=-1)


tfp = types.ModuleType("tensorflow_probability")
tfp.distributions = types.SimpleNamespace(RelaxedOneHotCategorical=_RelaxedOneHotCategorical)
sys.modules["tensorflow_probability"] = tfp

sys.path.insert(0, REFERENCE)

from Sampler import VQVAESampler  # noqa: E402
from vqvae import VQVAE  # noqa: E402

# Timing-neutral compat fix: VQVAESampler computes z-shapes with np.cumprod
# (np.int64) which trips an int64-vs-int32 dtype check inside ConditionerNet's
# shape assertion on this TF build.  Normalize to python ints before call.
import src.conditioner.conditioners as _cond_mod  # noqa: E402

_orig_cond_call = _cond_mod.ConditionerNet.call


def _cond_call(self, inputs, **kw):
    self.x_shape = tuple(int(v) for v in self.x_shape)
    self.down_depth = int(self.down_depth)
    self.stride = int(self.stride)
    return _orig_cond_call(self, inputs, **kw)


_cond_mod.ConditionerNet.call = _cond_call


def main():
    # Flagship geometry: 28672-sample clips at 3 kHz, hops 32/256
    # -> code contexts (896, 112); same as vae_music_tpu's FULL_PIPELINE.
    sample_length = 28672
    sr = 3000
    n_samples = 1
    down_depth = [5, 3]
    strides = [2, 2]
    n_ctxs = [896, 112]

    results = {"hardware": "CPU (TF %s)" % tf.__version__,
               "sample_length": sample_length, "sample_rate": sr,
               "n_samples": n_samples}

    print("Building reference VQVAE...")
    vqvae = VQVAE((sample_length, 1), levels=2, latent_dim=64, num_embeddings=512,
                  down_depth=down_depth, strides=strides, dilation_factor=3,
                  residual_width=32)

    x = tf.random.uniform([4, sample_length, 1])
    # Warm-up + build
    _ = vqvae.encode(x)
    t0 = time.time()
    iters = 5
    for _ in range(iters):
        zs = vqvae.encode(x)
    dt = (time.time() - t0) / iters
    tokens = sum(int(np.prod(z.shape)) for z in zs)
    results["encode_tokens_per_sec"] = tokens / dt
    print(f"encode: {tokens} tokens in {dt:.3f}s -> {tokens/dt:,.0f} tok/s")

    print("Building reference sampler (width 128, depth 6, ctx 896/112)...")
    sampler = VQVAESampler(down_depth=down_depth, strides=strides,
                           n_ctxs=n_ctxs, codebook_size=513, num_genres=10)

    t0 = time.time()
    zs = sampler.sample(n_samples=n_samples, y_genre=tf.constant([3] * n_samples))
    t_top_bottom = time.time() - t0
    print(f"[timing] token sampling (both levels): {t_top_bottom:.1f}s", flush=True)
    wav = vqvae.decode(zs[0], level=0)
    dt = time.time() - t0
    audio_seconds = n_samples * sample_length / sr
    results["generate_wall_seconds"] = dt
    results["generate_audio_seconds"] = audio_seconds
    results["clips_per_sec"] = audio_seconds / dt  # 1s-clips per wall second
    print(f"generation: {audio_seconds:.1f}s audio in {dt:.1f}s wall "
          f"-> {audio_seconds/dt:.4f} 1s-clips/sec")

    out = os.path.join(REPO, "baselines", "tf_cpu.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", out)


if __name__ == "__main__":
    main()
