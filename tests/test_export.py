"""AOT serving export: serialized chain == in-process chain."""

import jax
import jax.numpy as jnp
import numpy as np

from vae_music_tpu.configs import SamplerConfig, VQVAEConfig
from vae_music_tpu.sample.export import export_chain, load_chain
from vae_music_tpu.sample.sampler import AncestralSampler


def _sampler():
    vcfg = VQVAEConfig(
        sample_length=512, levels=2, latent_dim=8, codebook_size=16,
        down_depth=(3, 2), strides=(2, 2), residual_width=8, residual_depth=1,
        dilation_factor=3, use_spectral_loss=False,
    ).validate()
    scfg = SamplerConfig(vqvae=vcfg, prior_width=16, prior_depth=2,
                         prior_heads=2, prior_blocks=4, genre_classes=10)
    return AncestralSampler.from_config(scfg, jax.random.PRNGKey(0)), vcfg


def test_exported_chain_roundtrip(tmp_path):
    sampler, vcfg = _sampler()
    n = 2
    path = str(tmp_path / "chain.jaxexp")
    size = export_chain(sampler, n, path)
    assert size > 10_000  # weights embedded as constants

    fn = load_chain(path)
    key = jax.random.PRNGKey(7)
    y = jnp.array([1, 2], jnp.int32)
    exported = np.asarray(fn(jnp.asarray(key, jnp.uint32), y))
    in_process = np.asarray(sampler.compile_chain(n)(key, y))
    assert exported.shape == (n, vcfg.sample_length, 1)
    np.testing.assert_allclose(exported, in_process, atol=1e-6)


def test_exported_chain_unlabeled(tmp_path):
    sampler, vcfg = _sampler()
    path = str(tmp_path / "chain_nolabel.jaxexp")
    export_chain(sampler, 2, path, with_labels=False)
    fn = load_chain(path)
    wav = np.asarray(fn(jnp.asarray(jax.random.PRNGKey(3), jnp.uint32)))
    assert wav.shape == (2, vcfg.sample_length, 1)
    assert np.isfinite(wav).all()
