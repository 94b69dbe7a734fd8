"""Layer-grid fused decode kernel (ops/decode_grid_pallas.py) correctness.

Same central invariant as test_decode.py: the KV-cached grid decode must
reproduce the full-sequence forward (factorized_attention.py:446-462's
incremental==batch check, SURVEY.md §4.2), here through the depth-as-grid
kernel with online-softmax chunked history.  Runs in interpret mode on the
CPU mesh; the TPU fidelity/perf rows live in docs/SERVING.md.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_decode import _prior_cfg, _vqvae_cfg
from vae_music_tpu.models.prior import FMHAPrior, level_spec
from vae_music_tpu.sample.decode import SampleMode, make_decode_fn
from vae_music_tpu.train.prior_step import init_prior


def _logits_vs_full(pcfg, dkw, n=3, level=1, cond=False):
    vcfg = _vqvae_cfg()
    model, params = init_prior(jax.random.PRNGKey(1), vcfg, pcfg)
    spec = level_spec(vcfg, level)
    dec = make_decode_fn(pcfg, spec.ctx_len, n, mode=SampleMode.GREEDY,
                         fused="grid", fused_interpret=True,
                         return_logits=True, **dkw)
    y_cond = x_cond = None
    if cond:
        y_cond = model.apply(params, jnp.arange(1, n + 1),
                             method=FMHAPrior.embed_labels)
        z_cond = jax.random.randint(jax.random.PRNGKey(3),
                                    (n, spec.cond_length), 0, 16)
        x_cond = model.apply(params, z_cond, method=FMHAPrior.upsample_cond)
    tokens, logits = dec(params, jax.random.PRNGKey(2), x_cond, y_cond)
    full, _ = model.apply(params, tokens[:, :-1], x_cond, y_cond)
    return np.asarray(logits), np.asarray(full), np.asarray(tokens)


@pytest.mark.parametrize("kw,dkw,tol", [
    ({}, {}, 3e-5),                              # row/col/prev_row, 1 chunk
    ({}, {"grid_chunk": 2}, 3e-5),               # 4-chunk online softmax
    pytest.param({"heads": 1}, {"grid_chunk": 4}, 3e-5,
                 marks=pytest.mark.slow),
    pytest.param({"attn_stacks": 0}, {}, 3e-5,   # row/col schedule
                 marks=pytest.mark.slow),
])
def test_grid_decode_logits_equal_full_forward(kw, dkw, tol):
    l, full, tokens = _logits_vs_full(_prior_cfg(1, **kw), dkw)
    np.testing.assert_allclose(l, full, rtol=1e-4, atol=tol)
    np.testing.assert_array_equal(np.argmax(full, -1), tokens[:, 1:])


@pytest.mark.parametrize("dkw,tol", [
    ({"cache_dtype": "bfloat16"}, 0.08),
    ({"cache_dtype": "int8", "grid_chunk": 2}, 0.3),
    ({"cache_dtype": "bfloat16", "weight_dtype": "bfloat16"}, 0.15),
    # r5 perf levers: int8 streamed weights (per-column scales, dequantized
    # in-kernel) and bf16 history converts/multiplies.
    ({"cache_dtype": "int8", "weight_dtype": "int8"}, 0.3),
    ({"cache_dtype": "int8", "grid_hist_bf16": True, "grid_chunk": 2}, 0.3),
    # int4 packed-nibble caches (capacity mode: two values per byte).
    ({"cache_dtype": "int4", "grid_chunk": 2}, 1.5),
])
def test_grid_decode_reduced_precision_fidelity(dkw, tol):
    """bf16/int8 caches and bf16 streamed weights track the f32 full forward
    to their respective rounding tolerances (same bounds as the unrolled
    kernel's fidelity suite)."""
    l, full, _ = _logits_vs_full(_prior_cfg(1), dkw)
    assert np.abs(l - full).max() < tol


@pytest.mark.slow
def test_grid_decode_conditioned_upsampler():
    l, full, tokens = _logits_vs_full(_prior_cfg(0, cond=True), {}, level=0,
                                      cond=True)
    np.testing.assert_allclose(l, full, rtol=1e-4, atol=3e-5)
    np.testing.assert_array_equal(np.argmax(full, -1), tokens[:, 1:])


def test_grid_matches_unrolled_kernel_tokens():
    """Grid and unrolled fused kernels sample identical greedy tokens from
    identical state (they implement the same step; only the schedule
    differs)."""
    vcfg = _vqvae_cfg()
    pcfg = _prior_cfg(1)
    _, params = init_prior(jax.random.PRNGKey(1), vcfg, pcfg)
    spec = level_spec(vcfg, 1)
    dg = make_decode_fn(pcfg, spec.ctx_len, 2, mode=SampleMode.GREEDY,
                        fused="grid", fused_interpret=True)
    du = make_decode_fn(pcfg, spec.ctx_len, 2, mode=SampleMode.GREEDY,
                        fused=True, fused_interpret=True,
                        sample_in_kernel=False)
    tg = dg(params, jax.random.PRNGKey(2), None, None)
    tu = du(params, jax.random.PRNGKey(2), None, None)
    np.testing.assert_array_equal(np.asarray(tg), np.asarray(tu))
