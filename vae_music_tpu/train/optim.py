"""Shared optimizer utilities (used by both the VQ-VAE and prior trainers)."""

from __future__ import annotations

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
