"""Jitted VQ-VAE train/eval steps.

Functional equivalent of /root/reference/vqvae.py:111-172: per level forward ->
(recon MSE + multiscale spectral + commitment) summed over levels, one gradient
over all levels' conv params.  The EMA codebook update (a side-effecting
``Variable.assign`` in TF, VectorQuantizer.py:128-145) is returned as new state.

The step is written over the *global* batch; with a sharded batch
(NamedSharding over the 'data' axis) XLA turns the loss/grad/EMA reductions
into ICI collectives — no explicit psum code.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from vae_music_tpu.configs import VQVAEConfig
from vae_music_tpu.models.vqvae import vqvae_apply
from vae_music_tpu.train.state import VQVAETrainState


def make_vqvae_train_step(cfg: VQVAEConfig, donate: bool = True, mesh=None,
                          use_pallas=None):
    """``mesh``: pass the GSPMD mesh when the batch is sharded over 'data' so
    the fused VQ kernel runs per-shard (shard_map + psum'd EMA statistics)
    instead of falling back to the jnp path — see nn.quantizer.quantize."""
    def train_step(state: VQVAETrainState, batch: jnp.ndarray, rng: jax.Array):
        """batch: (N, T, C) waveforms. Returns (new_state, metrics)."""
        step_rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            _recons, total, new_codebooks, metrics = vqvae_apply(
                params, state.codebooks, cfg, batch, train=True, rng=step_rng,
                mesh=mesh, use_pallas=use_pallas)
            return total, (new_codebooks, metrics)

        grads, (new_codebooks, metrics) = jax.grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt_state = state.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  opt_state=new_opt_state, codebooks=new_codebooks)
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_vqvae_eval_step(cfg: VQVAEConfig, mesh=None, use_pallas=None):
    def eval_step(state: VQVAETrainState, batch: jnp.ndarray):
        _recons, _total, _cbs, metrics = vqvae_apply(
            state.params, state.codebooks, cfg, batch, train=False,
            mesh=mesh, use_pallas=use_pallas)
        return metrics

    return jax.jit(eval_step)
