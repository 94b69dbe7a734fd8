"""VQ-VAE model + train-step tests (semantics of /root/reference/vqvae.py,
encdec.py, resnet.py __main__ smoke blocks, SURVEY.md §4.1)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vae_music_tpu.configs import VQVAEConfig, get_config
from vae_music_tpu.data.audio import synthetic_audio_batch
from vae_music_tpu.models.vqvae import (
    init_vqvae,
    vqvae_apply,
    vqvae_decode,
    vqvae_encode,
)
from vae_music_tpu.nn.encdec import Decoder, Encoder
from vae_music_tpu.nn.resnet import DilatedResnet1D
from vae_music_tpu.train.state import VQVAETrainState
from vae_music_tpu.train.vqvae_step import make_vqvae_eval_step, make_vqvae_train_step


def _tiny_cfg(levels=2):
    return VQVAEConfig(
        sample_length=1024, levels=levels, latent_dim=8, codebook_size=16,
        down_depth=(3, 2)[:levels], strides=(2, 2)[:levels],
        residual_width=8, residual_depth=2, dilation_factor=3,
        use_spectral_loss=False,  # 1024 < largest STFT window
    ).validate()


def test_dilated_resnet_shapes_and_dilation_order():
    m = DilatedResnet1D(input_dim=8, depth=3, dilation_factor=3)
    assert m.dilations() == [1, 3, 9]
    m_rev = DilatedResnet1D(input_dim=8, depth=3, dilation_factor=3, reverse_dilation=True)
    assert m_rev.dilations() == [9, 3, 1]
    m_cyc = DilatedResnet1D(input_dim=8, depth=6, dilation_factor=3, dilation_cycle=4)
    assert m_cyc.dilations() == [1, 3, 9, 27, 1, 3]
    x = jnp.ones((2, 64, 8))
    params = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(params, x).shape == x.shape


def test_encoder_decoder_shapes():
    # Mirrors encdec.py:154-177 smoke shapes: down [5,3] strides [2,2] -> /256.
    enc = Encoder(output_dim=16, residual_width=8, residual_depth=2, depth=2,
                  down_depth=(5, 3), strides=(2, 2), dilation_factor=3)
    x = jnp.ones((2, 1024, 1))
    p = enc.init(jax.random.PRNGKey(0), x)
    z = enc.apply(p, x)
    assert z.shape == (2, 1024 // 256, 16)
    dec = Decoder(output_dim=1, embed_width=16, residual_width=8, residual_depth=2,
                  depth=2, down_depth=(5, 3), strides=(2, 2), dilation_factor=3)
    pd = dec.init(jax.random.PRNGKey(1), z)
    y = dec.apply(pd, z)
    assert y.shape == x.shape


def test_levels_have_increasing_hops():
    cfg = _tiny_cfg()
    assert cfg.hops == (8, 32)
    assert cfg.z_lengths == (128, 32)
    params, cbs = init_vqvae(jax.random.PRNGKey(0), cfg)
    x = jnp.ones((2, cfg.sample_length, 1))
    zs = vqvae_encode(params, cbs, cfg, x)
    assert [z.shape for z in zs] == [(2, 128), (2, 32)]


def test_encode_decode_roundtrip_shapes():
    cfg = _tiny_cfg()
    params, cbs = init_vqvae(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(synthetic_audio_batch(0, 2, cfg.sample_length)[0])
    zs = vqvae_encode(params, cbs, cfg, x)
    for level in range(cfg.levels):
        wav = vqvae_decode(params, cbs, cfg, zs[level], level)
        assert wav.shape == x.shape


def test_apply_metrics_match_reference_names():
    cfg = _tiny_cfg()
    params, cbs = init_vqvae(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(synthetic_audio_batch(0, 2, cfg.sample_length)[0])
    _, total, new_cbs, metrics = vqvae_apply(params, cbs, cfg, x, train=True,
                                             rng=jax.random.PRNGKey(1))
    for name in ("loss", "recon_loss", "vqvae_loss", "spectral_loss"):
        assert name in metrics
    for level in range(cfg.levels):
        for name in ("level_loss", "recon_loss", "vq_loss", "spectral_loss",
                     "batch_codebook_usage", "codebook_usage", "codebook_entropy"):
            assert f"[{level}]{name}" in metrics
    # total = sum of level losses (vqvae.py:137).
    lv = sum(float(metrics[f"[{l}]level_loss"]) for l in range(cfg.levels))
    np.testing.assert_allclose(float(total), lv, rtol=1e-6)


def test_train_step_reduces_loss():
    cfg = _tiny_cfg(levels=1)
    params, cbs = init_vqvae(jax.random.PRNGKey(0), cfg)
    state = VQVAETrainState.create(params, cbs, optax.adam(1e-3))
    step = make_vqvae_train_step(cfg, donate=False)
    x = jnp.asarray(synthetic_audio_batch(0, 4, cfg.sample_length)[0])
    rng = jax.random.PRNGKey(42)
    first = None
    for _ in range(25):
        state, metrics = step(state, x, rng)
        if first is None:
            first = float(metrics["loss"])
    assert float(metrics["loss"]) < first * 0.9
    assert int(state.step) == 25


def test_codebook_state_updates_in_train_but_not_eval():
    cfg = _tiny_cfg(levels=1)
    params, cbs = init_vqvae(jax.random.PRNGKey(0), cfg)
    state = VQVAETrainState.create(params, cbs, optax.adam(1e-3))
    x = jnp.asarray(synthetic_audio_batch(0, 2, cfg.sample_length)[0])
    train = make_vqvae_train_step(cfg, donate=False)
    new_state, _ = train(state, x, jax.random.PRNGKey(0))
    assert not np.allclose(np.asarray(new_state.codebooks[0].N_t),
                           np.asarray(state.codebooks[0].N_t))
    ev = make_vqvae_eval_step(cfg)
    _ = ev(state, x)  # eval must not require rng nor touch state


@pytest.mark.slow
def test_train_step_sharded_equals_single_device():
    """DP over the 8-device CPU mesh must produce the same update."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    cfg = _tiny_cfg(levels=1)
    params, cbs = init_vqvae(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(synthetic_audio_batch(0, 8, cfg.sample_length)[0])
    rng = jax.random.PRNGKey(1)

    s1 = VQVAETrainState.create(params, cbs, optax.adam(1e-3))
    step = make_vqvae_train_step(cfg, donate=False)
    out1, m1 = step(s1, x, rng)

    mesh = Mesh(np.array(jax.devices()).reshape(8, 1), ("data", "model"))
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    s2 = VQVAETrainState.create(params, cbs, optax.adam(1e-3))
    out2, m2 = step(s2, xs, rng)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    l1 = jax.tree_util.tree_leaves(out1.params)
    l2 = jax.tree_util.tree_leaves(out2.params)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out1.codebooks[0].embeddings),
                               np.asarray(out2.codebooks[0].embeddings),
                               rtol=1e-4, atol=1e-6)


def test_named_configs():
    for name in ("SMALL_VQ_VAE", "GTZAN_VQVAE"):
        cfg = get_config(name)
        cfg.validate()
    assert get_config("SMALL_PRIOR").level == 1
    assert get_config("SMALL_UPSAMPLER").conditioner is not None
    jv = get_config("JUKEBOX_VQVAE")
    jv.validate()
    assert jv.z_lengths == (8192, 1024)  # upsampler ctx 8192, cond len 1024
    ju = get_config("JUKEBOX_SMALL_UPSAMPLER")
    assert ju.conditioner is not None and ju.conditioner.dilation_cycle == 8
    assert ju.width == 1024 and ju.depth == 48 and ju.remat
    with pytest.raises(KeyError):
        get_config("NOPE")
