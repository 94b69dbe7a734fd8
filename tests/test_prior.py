"""Prior/upsampler model + train-step tests (prior.py, autoregressive_fmha.py,
conditioners.py, label_conditioners.py semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_music_tpu.configs import ConditionerConfig, PriorConfig, VQVAEConfig
from vae_music_tpu.data.audio import synthetic_audio_batch
from vae_music_tpu.models.conditioners import ConditionerNet, LabelConditioner
from vae_music_tpu.models.prior import (
    FMHAPrior,
    build_fmha_prior,
    get_cond,
    level_spec,
    shift_right_with_start,
    token_accuracy,
    token_loss,
)
from vae_music_tpu.models.vqvae import init_vqvae
from vae_music_tpu.train.prior_step import (
    default_prior_optimizer,
    init_prior,
    make_prior_eval_step,
    make_prior_train_step,
)
from vae_music_tpu.train.state import PriorTrainState


def _vqvae_cfg():
    return VQVAEConfig(
        sample_length=1024, levels=2, latent_dim=8, codebook_size=16,
        down_depth=(3, 2), strides=(2, 2), residual_width=8, residual_depth=2,
        dilation_factor=3, use_spectral_loss=False,
    ).validate()


def _prior_cfg(level, cond=False, genre=10):
    return PriorConfig(
        level=level, levels=2, bins=17, width=32, depth=3, heads=2, blocks=4,
        attn_stacks=1, dropout=0.0, genre_classes=genre,
        conditioner=ConditionerConfig(residual_depth=2) if cond else None,
    )


def test_conditioner_upsamples_exactly():
    # conditioners.py:74-91 — output length must be L_up * stride**down.
    m = ConditionerNet(cond_length=32, bins=17, embed_width=16, residual_width=8,
                       residual_depth=2, down_depth=2, stride=2,
                       dilation_factor=3, dilation_cycle=4)
    codes = jnp.zeros((2, 32), jnp.int32)
    params = m.init(jax.random.PRNGKey(0), codes)
    out = m.apply(params, codes)
    assert out.shape == (2, 128, 16)


def test_label_conditioner_shape():
    m = LabelConditioner(genre_bins=10, width=32)
    y = jnp.array([0, 5, 9])
    params = m.init(jax.random.PRNGKey(0), y)
    out = m.apply(params, y)
    assert out.shape == (3, 1, 32)


def test_level_spec_and_get_cond():
    vcfg = _vqvae_cfg()
    spec0 = level_spec(vcfg, 0)
    assert spec0.ctx_len == 128 and spec0.cond_downsample_rate == 4
    assert spec0.cond_length == 32
    spec1 = level_spec(vcfg, 1)
    assert spec1.ctx_len == 32 and spec1.cond_downsample_rate is None

    zs = [None, jnp.arange(64).reshape(2, 32)]
    z_cond = get_cond(zs, spec0, 0, 128)
    np.testing.assert_array_equal(np.asarray(z_cond), np.asarray(zs[1]))
    assert get_cond(zs, spec1, 0, 32) is None


def test_shift_right_with_start():
    codes = jnp.array([[3, 4, 5]])
    out = shift_right_with_start(codes, start_token=16)
    np.testing.assert_array_equal(np.asarray(out), [[16, 3, 4]])


def test_token_loss_and_accuracy():
    logits = jnp.full((1, 2, 4), 0.0).at[0, 0, 1].set(10.0).at[0, 1, 2].set(10.0)
    targets = jnp.array([[1, 2]])
    assert float(token_loss(targets, logits)) < 0.01
    assert float(token_accuracy(targets, logits)) == 1.0
    targets_bad = jnp.array([[0, 0]])
    assert float(token_accuracy(targets_bad, logits)) == 0.0


def test_ycond_replaces_start_token_embedding():
    """autoregressive_fmha.py:120-129 — y_cond swaps position 0 only."""
    vcfg = _vqvae_cfg()
    pcfg = _prior_cfg(level=1)
    model, params = init_prior(jax.random.PRNGKey(0), vcfg, pcfg)
    tokens = jnp.zeros((2, 32), jnp.int32)
    y_cond = model.apply(params, jnp.array([1, 2]), method=FMHAPrior.embed_labels)
    emb_with = model.apply(params, tokens, y_cond,
                           method=lambda m, t, yc: m.embed_tokens(t, yc))
    emb_without = model.apply(params, tokens, None,
                              method=lambda m, t, yc: m.embed_tokens(t, yc))
    assert not np.allclose(np.asarray(emb_with[:, 0]), np.asarray(emb_without[:, 0]))
    np.testing.assert_allclose(np.asarray(emb_with[:, 1:]),
                               np.asarray(emb_without[:, 1:]))


@pytest.mark.slow
def test_forward_shapes_top_and_upsampler():
    vcfg = _vqvae_cfg()
    for level, cond in [(1, False), (0, True)]:
        pcfg = _prior_cfg(level, cond)
        model, params = init_prior(jax.random.PRNGKey(0), vcfg, pcfg)
        spec = level_spec(vcfg, level)
        tokens = jnp.zeros((2, spec.ctx_len), jnp.int32)
        x_cond = (jnp.zeros((2, spec.cond_length), jnp.int32) if cond else None)
        logits, _ = model.apply(params, tokens, x_cond, None)
        assert logits.shape == (2, spec.ctx_len, pcfg.bins)


def test_prior_train_step_learns_and_updates_label_embedding():
    """prior.py:429-439 — label embedding must receive gradient updates."""
    vcfg = _vqvae_cfg()
    vp, cbs = init_vqvae(jax.random.PRNGKey(0), vcfg)
    pcfg = _prior_cfg(level=1)
    model, params = init_prior(jax.random.PRNGKey(1), vcfg, pcfg)
    # Constant LR here: the Noam schedule's warmup LR (~1e-5 at step 10) is
    # too small to observe learning in a 12-step test.
    import optax

    state = PriorTrainState.create(params, optax.adam(1e-3))
    step = make_prior_train_step(vcfg, pcfg, vp, cbs, donate=False)
    x, y = synthetic_audio_batch(0, 4, vcfg.sample_length)
    x, y = jnp.asarray(x), jnp.asarray(y)

    emb0 = np.asarray(
        state.params["params"]["label_conditioner"]["genre_emb"]["embedding"]).copy()
    losses = []
    for _ in range(12):
        state, m = step(state, x, y, jax.random.PRNGKey(2))
        losses.append(float(m["loss"]))
    emb1 = np.asarray(
        state.params["params"]["label_conditioner"]["genre_emb"]["embedding"])
    assert not np.allclose(emb0, emb1), "label embedding did not update"
    assert losses[-1] < losses[0]
    assert {"loss", "perplexity", "accuracy"} <= set(m)
    np.testing.assert_allclose(float(m["perplexity"]), np.exp(losses[-1]), rtol=1e-4)


@pytest.mark.slow
def test_upsampler_train_and_eval():
    vcfg = _vqvae_cfg()
    vp, cbs = init_vqvae(jax.random.PRNGKey(0), vcfg)
    pcfg = _prior_cfg(level=0, cond=True)
    model, params = init_prior(jax.random.PRNGKey(1), vcfg, pcfg)
    state = PriorTrainState.create(params, default_prior_optimizer(pcfg))
    step = make_prior_train_step(vcfg, pcfg, vp, cbs, donate=False)
    ev = make_prior_eval_step(vcfg, pcfg, vp, cbs)
    x, y = synthetic_audio_batch(1, 4, vcfg.sample_length)
    x, y = jnp.asarray(x), jnp.asarray(y)
    state, m = step(state, x, y, jax.random.PRNGKey(2))
    em = ev(state, x, y)
    assert np.isfinite(float(em["loss"]))


@pytest.mark.slow
def test_prior_without_labels():
    vcfg = _vqvae_cfg()
    vp, cbs = init_vqvae(jax.random.PRNGKey(0), vcfg)
    pcfg = _prior_cfg(level=1, genre=None)
    model, params = init_prior(jax.random.PRNGKey(1), vcfg, pcfg)
    assert "label_conditioner" not in params["params"]
    state = PriorTrainState.create(params, default_prior_optimizer(pcfg))
    step = make_prior_train_step(vcfg, pcfg, vp, cbs, donate=False)
    x, _ = synthetic_audio_batch(0, 2, vcfg.sample_length)
    state, m = step(state, jnp.asarray(x), None, jax.random.PRNGKey(2))
    assert np.isfinite(float(m["loss"]))
