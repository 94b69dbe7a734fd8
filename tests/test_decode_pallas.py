"""Fused Pallas decode-step kernel == XLA decode path (interpret mode, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_music_tpu.configs import ConditionerConfig, PriorConfig, VQVAEConfig
from vae_music_tpu.models.prior import FMHAPrior
from vae_music_tpu.sample.decode import SampleMode, make_decode_fn
from vae_music_tpu.train.prior_step import init_prior


def _vqvae_cfg():
    return VQVAEConfig(
        sample_length=1024, levels=2, latent_dim=8, codebook_size=16,
        down_depth=(3, 2), strides=(2, 2), residual_width=8, residual_depth=2,
        dilation_factor=3, use_spectral_loss=False,
    ).validate()


@pytest.mark.parametrize("level,cond", [(1, False), (0, True)])
def test_fused_decode_matches_xla_path(level, cond):
    vcfg = _vqvae_cfg()
    pcfg = PriorConfig(
        level=level, levels=2, bins=17, width=32, depth=3, heads=2, blocks=4,
        attn_stacks=1, dropout=0.0, genre_classes=10,
        conditioner=ConditionerConfig(residual_depth=2) if cond else None)
    model, params = init_prior(jax.random.PRNGKey(1), vcfg, pcfg)
    ctx = vcfg.z_lengths[level]
    n = 2
    y_cond = model.apply(params, jnp.array([1, 2]), method=FMHAPrior.embed_labels)
    x_cond = None
    if cond:
        z_cond = jax.random.randint(jax.random.PRNGKey(3), (n, ctx // 4), 0, 16)
        x_cond = model.apply(params, z_cond, method=FMHAPrior.upsample_cond)

    dec_xla = make_decode_fn(pcfg, ctx, n, mode=SampleMode.GREEDY,
                             return_logits=True, fused=False)
    dec_fused = make_decode_fn(pcfg, ctx, n, mode=SampleMode.GREEDY,
                               return_logits=True, fused=True,
                               fused_interpret=True)
    tok_x, log_x = dec_xla(params, jax.random.PRNGKey(2), x_cond, y_cond)
    tok_f, log_f = dec_fused(params, jax.random.PRNGKey(2), x_cond, y_cond)
    np.testing.assert_array_equal(np.asarray(tok_x), np.asarray(tok_f))
    np.testing.assert_allclose(np.asarray(log_x), np.asarray(log_f),
                               rtol=1e-5, atol=1e-5)
