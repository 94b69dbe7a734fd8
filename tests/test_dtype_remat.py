"""bfloat16 compute and rematerialization options."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vae_music_tpu.configs import PriorConfig, VQVAEConfig
from vae_music_tpu.data.audio import synthetic_audio_batch
from vae_music_tpu.models.vqvae import init_vqvae
from vae_music_tpu.train.prior_step import (
    default_prior_optimizer,
    init_prior,
    make_prior_train_step,
)
from vae_music_tpu.train.state import PriorTrainState, VQVAETrainState
from vae_music_tpu.train.vqvae_step import make_vqvae_train_step
import pytest


def _vcfg(dtype="float32"):
    return VQVAEConfig(
        sample_length=1024, levels=1, latent_dim=8, codebook_size=16,
        down_depth=(3,), strides=(2,), residual_width=8, residual_depth=1,
        dilation_factor=3, use_spectral_loss=False, dtype=dtype,
    ).validate()


@pytest.mark.slow
def test_vqvae_bf16_trains():
    cfg = _vcfg("bfloat16")
    params, cbs = init_vqvae(jax.random.PRNGKey(0), cfg)
    # params stay f32 (mixed precision: bf16 compute, f32 storage)
    assert all(x.dtype == jnp.float32 for x in jax.tree_util.tree_leaves(params))
    state = VQVAETrainState.create(params, cbs, optax.adam(1e-3))
    step = make_vqvae_train_step(cfg, donate=False)
    x = jnp.asarray(synthetic_audio_batch(0, 4, cfg.sample_length)[0])
    first = None
    for _ in range(15):
        state, m = step(state, x, jax.random.PRNGKey(1))
        first = first or float(m["loss"])
    assert np.isfinite(float(m["loss"]))
    assert float(m["loss"]) < first


@pytest.mark.slow
def test_prior_bf16_and_remat_train():
    vcfg = _vcfg()
    vp, cbs = init_vqvae(jax.random.PRNGKey(0), vcfg)
    for kw in ({"dtype": "bfloat16"}, {"remat": True}):
        pcfg = PriorConfig(level=0, levels=1, bins=17, width=32, depth=2,
                           heads=2, blocks=4, attn_stacks=1, dropout=0.0,
                           genre_classes=None, **kw)
        _, params = init_prior(jax.random.PRNGKey(1), vcfg, pcfg)
        state = PriorTrainState.create(params, default_prior_optimizer(pcfg))
        step = make_prior_train_step(vcfg, pcfg, vp, cbs, donate=False)
        x, _ = synthetic_audio_batch(0, 4, vcfg.sample_length)
        state, m = step(state, jnp.asarray(x), None, jax.random.PRNGKey(2))
        assert np.isfinite(float(m["loss"])), kw


def test_remat_matches_no_remat_loss():
    vcfg = _vcfg()
    vp, cbs = init_vqvae(jax.random.PRNGKey(0), vcfg)
    losses = {}
    for remat in (False, True):
        pcfg = PriorConfig(level=0, levels=1, bins=17, width=32, depth=2,
                           heads=2, blocks=4, attn_stacks=1, dropout=0.0,
                           genre_classes=None, remat=remat)
        _, params = init_prior(jax.random.PRNGKey(1), vcfg, pcfg)
        state = PriorTrainState.create(params, default_prior_optimizer(pcfg))
        step = make_prior_train_step(vcfg, pcfg, vp, cbs, donate=False)
        x, _ = synthetic_audio_batch(0, 4, vcfg.sample_length)
        state, m = step(state, jnp.asarray(x), None, jax.random.PRNGKey(2))
        losses[remat] = float(m["loss"])
    np.testing.assert_allclose(losses[False], losses[True], rtol=1e-5)
