"""Shared optimizer utilities (used by both the VQ-VAE and prior trainers)."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax


def with_grad_accumulation(
    tx: optax.GradientTransformation, accum_steps: int
) -> optax.GradientTransformation:
    """Microbatch gradient accumulation: grads average over ``accum_steps``
    consecutive step() calls, params update on every k-th.  Lets a single
    chip train with an effective batch k x larger than fits in HBM (the
    reference is single-device Keras with no equivalent)."""
    if accum_steps <= 1:
        return tx
    return optax.MultiSteps(tx, every_k_schedule=accum_steps)


def init_param_ema(params: Any) -> Any:
    """Start a Polyak/EMA shadow copy of the params (serve-time weights).

    A REAL copy, not an alias: train steps donate their input buffers, so
    the shadow must own distinct device memory or it dies with the first
    donated step.  The reference has no equivalent; EMA'd weights are the
    standard way to serve generative models a notch above the raw trajectory."""
    return jax.tree_util.tree_map(jnp.copy, params)


@jax.jit
def update_param_ema(ema: Any, params: Any, decay: float = 0.999) -> Any:
    """One EMA step: ema <- decay*ema + (1-decay)*params.  Call after each
    optimizer update; pure + jitted, so it fuses into the training program
    and shards with whatever mesh the params use."""
    return jax.tree_util.tree_map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay), ema, params)
