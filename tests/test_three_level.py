"""3-level pipeline (the reference's Sampler.py:128 configuration:
down_depth [3,2,2], strides [2,2,2]) — nothing may assume 2 levels."""

import jax
import jax.numpy as jnp
import numpy as np

from vae_music_tpu.configs import ConditionerConfig, SamplerConfig, VQVAEConfig
from vae_music_tpu.data.audio import synthetic_audio_batch
from vae_music_tpu.models.prior import level_spec
from vae_music_tpu.models.vqvae import init_vqvae, vqvae_encode
from vae_music_tpu.sample.sampler import AncestralSampler
import pytest


def _vcfg():
    # hops 8/32/128; T=1024 -> z lengths (128, 32, 8)
    return VQVAEConfig(
        sample_length=1024, levels=3, latent_dim=8, codebook_size=16,
        down_depth=(3, 2, 2), strides=(2, 2, 2), residual_width=8,
        residual_depth=1, dilation_factor=3, use_spectral_loss=False,
    ).validate()


def test_three_level_geometry():
    vcfg = _vcfg()
    assert vcfg.hops == (8, 32, 128)
    assert vcfg.z_lengths == (128, 32, 8)
    s0, s1, s2 = (level_spec(vcfg, l) for l in range(3))
    assert s0.cond_downsample_rate == 4 and s0.cond_length == 32
    assert s1.cond_downsample_rate == 4 and s1.cond_length == 8
    assert s2.cond_downsample_rate is None


@pytest.mark.slow
def test_three_level_encode_and_ancestral_sampling():
    vcfg = _vcfg()
    params, cbs = init_vqvae(jax.random.PRNGKey(0), vcfg)
    x = jnp.asarray(synthetic_audio_batch(0, 2, vcfg.sample_length)[0])
    zs = vqvae_encode(params, cbs, vcfg, x)
    assert [z.shape for z in zs] == [(2, 128), (2, 32), (2, 8)]

    scfg = SamplerConfig(vqvae=vcfg, prior_width=32, prior_depth=3,
                         prior_heads=2, prior_blocks=4, genre_classes=10,
                         conditioner=ConditionerConfig(residual_depth=1))
    sampler = AncestralSampler.from_config(scfg, jax.random.PRNGKey(1))
    zs = sampler.sample_codes(2, jax.random.PRNGKey(2), y_genre=jnp.array([0, 1]))
    assert [z.shape for z in zs] == [(2, 128), (2, 32), (2, 8)]
    wav = sampler.sample_audio(2, jax.random.PRNGKey(3))
    assert wav.shape == (2, 1024, 1)
    assert np.isfinite(np.asarray(wav)).all()
