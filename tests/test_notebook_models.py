"""PixelCNN prior and CVAE lineage tests (notebooks #21/#22 in SURVEY.md §2)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vae_music_tpu.data.audio import mu_law_decode, mu_law_encode
from vae_music_tpu.models.cvae import (
    CVAE,
    CVAEMulaw,
    cvae_loss,
    cvae_mulaw_loss,
    kl_divergence,
)
from vae_music_tpu.models.pixelcnn import (
    PixelCNN,
    make_pixelcnn_sampler,
    pixelcnn_log_prob,
    pixelcnn_loss,
    pixelcnn_mask,
)
from vae_music_tpu.sample.decode import SampleMode


def test_mask_type_a_excludes_center_b_includes():
    a = pixelcnn_mask((3, 3), 1, 1, "A")[..., 0, 0]
    b = pixelcnn_mask((3, 3), 1, 1, "B")[..., 0, 0]
    np.testing.assert_array_equal(a, [[1, 1, 1], [1, 0, 0], [0, 0, 0]])
    np.testing.assert_array_equal(b, [[1, 1, 1], [1, 1, 0], [0, 0, 0]])


def test_pixelcnn_causality_2d():
    """Changing a future position must not change earlier logits."""
    model = PixelCNN(bins=8, filters=16, residual_blocks=1, kernel=(3, 3))
    codes = jnp.zeros((1, 5, 5), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), codes)
    base = model.apply(params, codes)
    # Flip position (2, 3); logits at raster-order-earlier positions (and at
    # (2,3) itself, type-A chain) must be unchanged.
    changed = codes.at[0, 2, 3].set(5)
    out = model.apply(params, changed)
    flat_base = np.asarray(base).reshape(25, -1)
    flat_out = np.asarray(out).reshape(25, -1)
    pos = 2 * 5 + 3
    np.testing.assert_allclose(flat_out[: pos + 1], flat_base[: pos + 1],
                               rtol=1e-5, atol=1e-6)
    assert not np.allclose(flat_out[pos + 1 :], flat_base[pos + 1 :])


def test_pixelcnn_1d_and_class_conditioning():
    model = PixelCNN(bins=8, filters=16, residual_blocks=1, kernel=(1, 5),
                     num_classes=10)
    codes = jnp.zeros((2, 12), jnp.int32)
    labels = jnp.array([1, 7])
    params = model.init(jax.random.PRNGKey(0), codes, labels)
    logits = model.apply(params, codes, labels)
    assert logits.shape == (2, 12, 8)
    logits2 = model.apply(params, codes, jnp.array([2, 3]))
    assert not np.allclose(np.asarray(logits), np.asarray(logits2))
    loss = pixelcnn_loss(model, params, codes, labels)
    assert np.isfinite(float(loss))


def test_pixelcnn_log_prob_matches_negative_ce_sum():
    """log_prob (the tfp.distributions.PixelCNN.log_prob interface, notebook
    cells 60-92) == -(mean CE) * positions, per sample."""
    model = PixelCNN(bins=8, filters=16, residual_blocks=1, kernel=(3, 3),
                     num_classes=10)
    codes = jax.random.randint(jax.random.PRNGKey(2), (3, 4, 5), 0, 8)
    labels = jnp.array([0, 4, 9])
    params = model.init(jax.random.PRNGKey(0), codes, labels)

    lp = pixelcnn_log_prob(model, params, codes, labels)
    assert lp.shape == (3,)
    # per-sample: -mean CE over that sample's grid * grid size
    for i in range(3):
        loss_i = pixelcnn_loss(model, params, codes[i : i + 1],
                               labels[i : i + 1])
        np.testing.assert_allclose(float(lp[i]), -float(loss_i) * 20,
                                   rtol=1e-5)
    # 1-D grids too
    model1d = PixelCNN(bins=8, filters=8, residual_blocks=1, kernel=(1, 5))
    codes1d = jax.random.randint(jax.random.PRNGKey(3), (2, 12), 0, 8)
    params1d = model1d.init(jax.random.PRNGKey(0), codes1d)
    lp1d = pixelcnn_log_prob(model1d, params1d, codes1d)
    assert lp1d.shape == (2,)
    np.testing.assert_allclose(
        float(jnp.mean(lp1d)) / -12,
        float(pixelcnn_loss(model1d, params1d, codes1d)), rtol=1e-5)


def test_pixelcnn_sampler_shapes_and_determinism():
    model = PixelCNN(bins=8, filters=8, residual_blocks=1, kernel=(3, 3))
    codes = jnp.zeros((2, 4, 4), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), codes)
    sampler = make_pixelcnn_sampler(model, (4, 4), 2)
    g1 = sampler(params, jax.random.PRNGKey(1))
    g2 = sampler(params, jax.random.PRNGKey(1))
    assert g1.shape == (2, 4, 4)
    assert g1.dtype == jnp.int32
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))
    assert 0 <= int(g1.min()) and int(g1.max()) < 8


def test_pixelcnn_sampler_1d():
    model = PixelCNN(bins=8, filters=8, residual_blocks=1, kernel=(1, 5))
    codes = jnp.zeros((2, 10), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), codes)
    sampler = make_pixelcnn_sampler(model, (10,), 2, mode=SampleMode.GREEDY)
    g = sampler(params, jax.random.PRNGKey(1))
    assert g.shape == (2, 10)


@pytest.mark.slow
def test_pixelcnn_learns_constant_grid():
    model = PixelCNN(bins=4, filters=16, residual_blocks=1, kernel=(3, 3))
    codes = jnp.full((8, 4, 4), 2, jnp.int32)
    params = model.init(jax.random.PRNGKey(0), codes)
    tx = optax.adam(1e-2)
    opt = tx.init(params)
    grad_fn = jax.jit(jax.value_and_grad(
        lambda p: pixelcnn_loss(model, p, codes)))
    loss0 = None
    for _ in range(30):
        loss, g = grad_fn(params)
        if loss0 is None:
            loss0 = float(loss)
        upd, opt = tx.update(g, opt, params)
        params = optax.apply_updates(params, upd)
    assert float(loss) < loss0 * 0.2


# -- mu-law codec + CVAE ------------------------------------------------------


def test_mu_law_roundtrip():
    x = jnp.asarray(np.linspace(-1, 1, 101, dtype=np.float32))
    codes = mu_law_encode(x)
    assert int(codes.min()) >= 0 and int(codes.max()) <= 255
    recon = mu_law_decode(codes)
    np.testing.assert_allclose(np.asarray(recon), np.asarray(x), atol=0.02)


def test_kl_divergence_zero_for_standard_normal():
    mean = jnp.zeros((4, 8))
    logvar = jnp.zeros((4, 8))
    assert float(kl_divergence(mean, logvar)) == 0.0


def test_cvae_forward_and_loss():
    model = CVAE(sample_length=256, latent_dim=16)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 256, 1))
    params = model.init(jax.random.PRNGKey(1), x, jax.random.PRNGKey(2))
    recon, mean, logvar = model.apply(params, x, jax.random.PRNGKey(3))
    assert recon.shape == x.shape
    loss, aux = cvae_loss(model, params, x, jax.random.PRNGKey(4))
    assert np.isfinite(float(loss))
    assert set(aux) == {"recon_loss", "kl"}


def test_cvae_mulaw_forward_and_loss():
    model = CVAEMulaw(sample_length=256, latent_dim=16)
    x = jnp.tanh(jax.random.normal(jax.random.PRNGKey(0), (2, 256, 1)))
    params = model.init(jax.random.PRNGKey(1), x, jax.random.PRNGKey(2))
    logits, mean, logvar = model.apply(params, x, jax.random.PRNGKey(3))
    assert logits.shape == (2, 256, 256)
    loss, aux = cvae_mulaw_loss(model, params, x, jax.random.PRNGKey(4))
    assert np.isfinite(float(loss))


@pytest.mark.slow
def test_cvae_trains():
    model = CVAE(sample_length=256, latent_dim=8)
    x = jnp.asarray(np.sin(np.linspace(0, 20, 256, dtype=np.float32)))[None, :, None]
    x = jnp.tile(x, (4, 1, 1))
    params = model.init(jax.random.PRNGKey(1), x, jax.random.PRNGKey(2))
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, rng):
        (loss, aux), g = jax.value_and_grad(
            lambda p: cvae_loss(model, p, x, rng, kl_weight=0.01),
            has_aux=True)(params)
        upd, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, upd), opt, loss

    loss0 = None
    for i in range(40):
        params, opt, loss = step(params, opt, jax.random.PRNGKey(i))
        if loss0 is None:
            loss0 = float(loss)
    assert float(loss) < loss0
