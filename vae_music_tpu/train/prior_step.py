"""Jitted prior/upsampler train & eval steps.

Functional mirror of /root/reference/prior.py:241-372:
  * frozen VQ-VAE encodes raw audio to code grids (:259)
  * input = codes shifted right with start-token pad ``bins-1`` (:262-265)
  * scheduled-sampling/teacher-forcing mix: first forward produces
    predictions; a random ``teacher_force_rate`` fraction of input positions
    is replaced by the model's own (shifted) predictions; the second forward
    computes the loss (:278-297)
  * gradients flow to the prior (+ label conditioner) only (:299-301)
  * metrics: token CE loss, perplexity=exp(loss), accuracy (:331-335)

The VQ-VAE params/codebooks are closed over as compile-time constants of the
jitted step (they are frozen — exactly the reference's stop-gradient boundary).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax

from vae_music_tpu.configs import PriorConfig, VQVAEConfig
from vae_music_tpu.models.prior import (
    FMHAPrior,
    build_fmha_prior,
    level_spec,
    shift_right_with_start,
    token_accuracy,
    token_loss,
)
from vae_music_tpu.models.vqvae import vqvae_encode
from vae_music_tpu.nn.positional import noam_schedule
from vae_music_tpu.train.optim import with_grad_accumulation
from vae_music_tpu.train.state import PriorTrainState


def default_prior_optimizer(
    cfg: PriorConfig, accum_steps: int = 1,
    clip_norm: Optional[float] = None, lr_scale: float = 1.0,
) -> optax.GradientTransformation:
    """Adam + Noam warmup (multi_head_attention.py:82-101).

    ``clip_norm``: optional global-norm gradient clipping ahead of Adam.
    Off by default (the reference trains un-clipped); the wide
    ctx-8192 upsampler at batch 2 needs it — un-clipped, its loss spiked
    past 30 nats and went NaN at step 2330 as the Noam warmup LR rose
    (runs/soak_wide r5 post-mortem; scripts/soak_wide.py passes 1.0).
    ``lr_scale`` multiplies the Noam schedule (peak LR control without
    touching ``warmup_steps``' shape).
    """
    sched = noam_schedule(cfg.width, cfg.warmup_steps)
    lr = (sched if lr_scale == 1.0
          else (lambda step: lr_scale * sched(step)))
    tx = optax.adam(lr, b1=0.9, b2=0.98, eps=1e-9)
    if clip_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(clip_norm), tx)
    return with_grad_accumulation(tx, accum_steps)


def init_prior(rng: jax.Array, vqvae_cfg: VQVAEConfig, prior_cfg: PriorConfig):
    """Returns (model, params)."""
    model = build_fmha_prior(vqvae_cfg, prior_cfg)
    spec = level_spec(vqvae_cfg, prior_cfg.level)
    tokens = jnp.zeros((1, spec.ctx_len), jnp.int32)
    x_cond = (jnp.zeros((1, spec.cond_length), jnp.int32)
              if prior_cfg.conditioner is not None else None)
    y = (jnp.zeros((1,), jnp.int32) if prior_cfg.genre_classes is not None else None)
    y_cond = None
    p_rng, d_rng = jax.random.split(rng)
    if y is not None:
        # Initialize label embedding as part of the same param tree.
        variables = model.init({"params": p_rng, "dropout": d_rng}, tokens,
                               x_cond, None, train=False,
                               method=_init_all, y=y)
    else:
        variables = model.init({"params": p_rng, "dropout": d_rng}, tokens,
                               x_cond, None, train=False)
    return model, variables


def _init_all(self: FMHAPrior, tokens, x_cond, y_cond, *, train, y):
    """Init helper touching every submodule (incl. label conditioner)."""
    y_cond = self.embed_labels(y)
    return self(tokens, x_cond, y_cond, train=train)


def _forward(model: FMHAPrior, params, tokens, x_cond, y, *, train, rng=None):
    y_cond = (model.apply(params, y, method=FMHAPrior.embed_labels)
              if y is not None else None)
    rngs = {"dropout": rng} if (train and rng is not None) else None
    logits, _ = model.apply(params, tokens, x_cond, y_cond, train=train, rngs=rngs)
    return logits


def build_prior_train_step(
    vqvae_cfg: VQVAEConfig,
    prior_cfg: PriorConfig,
    vqvae_params,
    codebooks,
):
    """The un-jitted train-step function (shared by the jit wrappers below
    and by parallel/fsdp.py, which jits it under FSDP shardings)."""
    model = build_fmha_prior(vqvae_cfg, prior_cfg)
    level = prior_cfg.level
    levels = vqvae_cfg.levels
    conditioned = prior_cfg.conditioner is not None
    start_token = prior_cfg.bins - 1
    tf_rate = prior_cfg.teacher_force_rate

    def train_step(state: PriorTrainState, audio: jnp.ndarray,
                   labels: Optional[jnp.ndarray], rng: jax.Array):
        step_rng = jax.random.fold_in(rng, state.step)
        tf_rng, drop_rng1, drop_rng2 = jax.random.split(step_rng, 3)

        # Frozen VQ-VAE encode (prior.py:259); codes are data, no gradient.
        zs = vqvae_encode(vqvae_params, codebooks, vqvae_cfg, audio, level, levels)
        codes = zs[0]
        upper = zs[1] if conditioned else None

        latent_input = shift_right_with_start(codes, start_token)
        target = codes

        def loss_fn(params):
            logits1 = _forward(model, params, latent_input, upper, labels,
                               train=True, rng=drop_rng1)
            # Shifted self-predictions as alternative inputs (prior.py:283-285).
            pred = jnp.argmax(logits1, axis=-1)
            pred_input = shift_right_with_start(pred, start_token)
            mix = jnp.where(
                jax.random.uniform(tf_rng, pred_input.shape) < tf_rate,
                pred_input, latent_input)
            mix = jax.lax.stop_gradient(mix)
            logits = _forward(model, params, mix, upper, labels,
                              train=True, rng=drop_rng2)
            loss = token_loss(target, logits)
            return loss, logits

        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {
            "loss": loss,
            "perplexity": jnp.exp(loss),
            "accuracy": token_accuracy(target, logits),
        }
        return state.replace(step=state.step + 1, params=new_params,
                             opt_state=new_opt), metrics

    return train_step


def make_prior_train_step(
    vqvae_cfg: VQVAEConfig,
    prior_cfg: PriorConfig,
    vqvae_params,
    codebooks,
    donate: bool = True,
):
    train_step = build_prior_train_step(vqvae_cfg, prior_cfg, vqvae_params,
                                        codebooks)
    return jax.jit(train_step, donate_argnums=(0,) if donate else (),
                   static_argnums=())


def make_prior_grad_fn(vqvae_cfg, prior_cfg, vqvae_params, codebooks):
    """Jitted gradient snapshot for histogram logging (prior.py:306-316).

    Returns ``grad_fn(state, audio, labels) -> grads`` — the teacher-forced
    token-loss gradient of every prior parameter (deterministic: no dropout,
    no scheduled-sampling mix), computed on demand so the expensive logging
    (flagged EXPENSIVE in the reference) costs nothing on ordinary steps.
    """
    model = build_fmha_prior(vqvae_cfg, prior_cfg)
    level = prior_cfg.level
    levels = vqvae_cfg.levels
    conditioned = prior_cfg.conditioner is not None
    start_token = prior_cfg.bins - 1

    def grad_fn(state: PriorTrainState, audio, labels):
        zs = vqvae_encode(vqvae_params, codebooks, vqvae_cfg, audio, level, levels)
        codes = zs[0]
        upper = zs[1] if conditioned else None
        latent_input = shift_right_with_start(codes, start_token)

        def loss_fn(params):
            logits = _forward(model, params, latent_input, upper, labels,
                              train=False)
            return token_loss(codes, logits)

        return jax.grad(loss_fn)(state.params)

    return jax.jit(grad_fn)


def make_prior_eval_step(vqvae_cfg, prior_cfg, vqvae_params, codebooks):
    model = build_fmha_prior(vqvae_cfg, prior_cfg)
    level = prior_cfg.level
    levels = vqvae_cfg.levels
    conditioned = prior_cfg.conditioner is not None
    start_token = prior_cfg.bins - 1

    def eval_step(state: PriorTrainState, audio, labels):
        zs = vqvae_encode(vqvae_params, codebooks, vqvae_cfg, audio, level, levels)
        codes = zs[0]
        upper = zs[1] if conditioned else None
        latent_input = shift_right_with_start(codes, start_token)
        logits = _forward(model, state.params, latent_input, upper, labels,
                          train=False)
        loss = token_loss(codes, logits)
        return {"loss": loss, "perplexity": jnp.exp(loss),
                "accuracy": token_accuracy(codes, logits)}

    return jax.jit(eval_step)
