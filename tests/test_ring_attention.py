"""Sequence-parallel attention == single-device attention (8-device CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from vae_music_tpu.nn.attention import col_attn, prev_row_attn, row_attn
from vae_music_tpu.parallel.ring_attention import sequence_parallel_attention

REFS = {0: row_attn, 1: col_attn, 2: prev_row_attn}


@pytest.fixture
def mesh():
    return Mesh(np.array(jax.devices()).reshape(8), ("seq",))


@pytest.mark.parametrize("pattern", [0, 1, 2])
def test_sequence_parallel_matches_single_device(pattern, mesh):
    n, t, h, hd = 2, 128, 2, 8
    block_len = 8  # 16 blocks over 8 devices -> 2 blocks/device
    rng = jax.random.PRNGKey(0)
    rq, rk, rv = jax.random.split(rng, 3)
    q = jax.random.normal(rq, (n, t, h, hd))
    k = jax.random.normal(rk, (n, t, h, hd))
    v = jax.random.normal(rv, (n, t, h, hd))

    ref, _ = REFS[pattern](q, k, v, block_len)
    out = sequence_parallel_attention(q, k, v, pattern=pattern,
                                      block_len=block_len, mesh=mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_prev_row_first_block_zero(mesh):
    n, t, h, hd = 1, 64, 1, 8
    q = jax.random.normal(jax.random.PRNGKey(1), (n, t, h, hd))
    out = sequence_parallel_attention(q, q, q, pattern=2, block_len=8,
                                      mesh=mesh)
    np.testing.assert_allclose(np.asarray(out[:, :8]), 0.0, atol=1e-6)
