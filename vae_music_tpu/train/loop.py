"""Training loops.

Reconstructs the missing trainer glue (the reference's main trainer notebook
is a lost LFS blob — /root/reference/.MISSING_LARGE_BLOBS, SURVEY.md §2
"Missing artifacts"): dataset batching -> jitted step -> monitor hooks ->
checkpoint/resume, for both the VQ-VAE and the priors.

Data parallelism: pass a Mesh and batches are placed with a 'data'-axis
sharding; the jitted steps are written over the global batch so XLA handles
the rest.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vae_music_tpu.configs import PriorConfig, VQVAEConfig
from vae_music_tpu.models.vqvae import init_vqvae, vqvae_apply
from vae_music_tpu.train.monitors import PriorMonitor, VQVAEMonitor
from vae_music_tpu.train.prior_step import (
    default_prior_optimizer,
    init_prior,
    make_prior_eval_step,
    make_prior_train_step,
)
from vae_music_tpu.train.state import PriorTrainState, VQVAETrainState
from vae_music_tpu.train.vqvae_step import make_vqvae_train_step


def _batches(x: np.ndarray, y: Optional[np.ndarray], batch_size: int,
             rng: np.random.Generator, sharding=None):
    """Shuffled, drop-remainder batching with optional device sharding.

    Multi-host: builds the global array from per-host rows
    (parallel/input.py — jax.make_array_from_process_local_data); each
    process supplies batch_size // process_count rows of every step.
    """
    from vae_music_tpu.parallel.input import put_global_batch

    idx = rng.permutation(len(x))
    for i in range(0, len(x) - batch_size + 1, batch_size):
        sel = idx[i : i + batch_size]
        xb = jnp.asarray(x[sel])
        yb = jnp.asarray(y[sel]) if y is not None else None
        if sharding is not None:
            xb = put_global_batch(xb, sharding)
            if yb is not None:
                yb = put_global_batch(yb, sharding)
        yield xb, yb


def train_vqvae(
    cfg: VQVAEConfig,
    x_train: np.ndarray,
    *,
    epochs: int = 1,
    batch_size: int = 8,
    learning_rate: float = 3e-4,
    seed: int = 0,
    state: Optional[VQVAETrainState] = None,
    monitor: Optional[VQVAEMonitor] = None,
    sharding=None,
    guard_nan: bool = False,
) -> VQVAETrainState:
    """``guard_nan`` adds failure recovery (SURVEY.md §5): a step producing a
    non-finite loss is discarded and training resumes from the pre-step state
    (the reference's only recovery story is "restore the checkpoint and
    rerun")."""
    rng = jax.random.PRNGKey(seed)
    if state is None:
        params, codebooks = init_vqvae(rng, cfg)
        state = VQVAETrainState.create(params, codebooks,
                                       optax.adam(learning_rate))
    step_fn = make_vqvae_train_step(cfg, donate=not guard_nan)
    np_rng = np.random.default_rng(seed)
    for epoch in range(epochs):
        for xb, _ in _batches(x_train, None, batch_size, np_rng, sharding):
            new_state, metrics = step_fn(state, xb, rng)
            if guard_nan and not np.isfinite(float(metrics["loss"])):
                print(f"[guard_nan] non-finite loss at step {int(state.step)}; "
                      "discarding update")
                continue
            state = new_state
            if monitor is not None:
                monitor.on_step(int(state.step), metrics)
        if monitor is not None:
            monitor.on_epoch_end(epoch, state)
    return state


def train_prior(
    vqvae_cfg: VQVAEConfig,
    prior_cfg: PriorConfig,
    vqvae_params,
    codebooks,
    x_train: np.ndarray,
    y_train: Optional[np.ndarray] = None,
    *,
    epochs: int = 1,
    batch_size: int = 8,
    seed: int = 0,
    state: Optional[PriorTrainState] = None,
    monitor: Optional[PriorMonitor] = None,
    sharding=None,
) -> PriorTrainState:
    rng = jax.random.PRNGKey(seed)
    if state is None:
        _, params = init_prior(rng, vqvae_cfg, prior_cfg)
        state = PriorTrainState.create(params, default_prior_optimizer(prior_cfg))
    if prior_cfg.genre_classes is None:
        y_train = None
    step_fn = make_prior_train_step(vqvae_cfg, prior_cfg, vqvae_params, codebooks)
    np_rng = np.random.default_rng(seed)
    for epoch in range(epochs):
        for xb, yb in _batches(x_train, y_train, batch_size, np_rng, sharding):
            state, metrics = step_fn(state, xb, yb, rng)
            if monitor is not None:
                monitor.on_step(int(state.step), metrics)
        if monitor is not None:
            monitor.on_epoch_end(epoch, state,
                                 jax.random.fold_in(rng, 10_000 + epoch))
    return state


def make_inspect_fn(cfg: VQVAEConfig):
    """Per-level reconstructions for monitoring (vae_monitor.py:109-137)."""

    @jax.jit
    def inspect(state, batch):
        recons, _total, _cbs, _m = vqvae_apply(state.params, state.codebooks,
                                               cfg, batch, train=False)
        return recons

    return inspect
