"""Factorized-attention pattern tests.

Covers: receptive-field correctness of row/col/prev_row against a dense
reference, and the incremental(prefix)==batch invariant — the single genuine
correctness test in the reference (factorized_attention.py:446-462)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_music_tpu.nn.attention import (
    COL,
    PREV_ROW,
    ROW,
    FactorizedAttention,
    causal_mask,
    col_attn,
    masked_mha,
    prev_row_attn,
    row_attn,
)
from vae_music_tpu.nn.transformer import FactorizedTransformer, attn_pattern_schedule


def _qkv(n=2, t=16, h=2, hd=4, seed=0):
    r = jax.random.PRNGKey(seed)
    rq, rk, rv = jax.random.split(r, 3)
    return (jax.random.normal(rq, (n, t, h, hd)),
            jax.random.normal(rk, (n, t, h, hd)),
            jax.random.normal(rv, (n, t, h, hd)))


def _dense_with_allowed(q, k, v, allowed):
    """Dense attention restricted to an explicit (T, T) allowed matrix."""
    out, _ = masked_mha(q, k, v, jnp.asarray(allowed))
    return out


def _allowed_matrix(t, block_len, pattern):
    allowed = np.zeros((t, t), bool)
    for qi in range(t):
        b, i = divmod(qi, block_len)
        if pattern == ROW:
            allowed[qi, b * block_len : qi + 1] = True
        elif pattern == COL:
            for j in range(b + 1):
                allowed[qi, j * block_len + i] = True
        else:  # PREV_ROW
            if b > 0:
                allowed[qi, (b - 1) * block_len : b * block_len] = True
    return allowed


@pytest.mark.parametrize("pattern,fn", [(ROW, row_attn), (COL, col_attn)])
def test_pattern_matches_dense_reference(pattern, fn):
    block_len = 4
    q, k, v = _qkv(t=16)
    out, _ = fn(q, k, v, block_len)
    want = _dense_with_allowed(q, k, v, _allowed_matrix(16, block_len, pattern))
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=1e-5, atol=1e-6)


def test_prev_row_matches_dense_and_zero_first_block():
    block_len = 4
    q, k, v = _qkv(t=16)
    out, _ = prev_row_attn(q, k, v, block_len)
    want = _dense_with_allowed(q, k, v, _allowed_matrix(16, block_len, PREV_ROW))
    # First block has an empty receptive field -> reference outputs zeros
    # (attention over a zero block, factorized_attention.py:341-344).
    np.testing.assert_allclose(np.asarray(out[:, :block_len]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[:, block_len:]),
                               np.asarray(want[:, block_len:]), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("attn_func", [ROW, COL, PREV_ROW])
@pytest.mark.slow
def test_incremental_equals_batch(attn_func):
    """factorized_attention.py:446-462 — prefix outputs equal batch outputs."""
    m = FactorizedAttention(ctx_len=16, num_heads=1, d_model=4, blocks=4,
                            attn_func=attn_func)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 16, 4))
    params = m.init(jax.random.PRNGKey(1), x)
    full = m.apply(params, x)
    for i in range(16):
        out = m.apply(params, x[:, : i + 1])
        diff = float(jnp.max(jnp.abs(out - full[:, : i + 1])))
        assert diff <= 1e-5, f"step {i}: {diff}"


def test_causal_mask():
    m = np.asarray(causal_mask(3, 3))
    np.testing.assert_array_equal(m, np.tril(np.ones((3, 3))).astype(bool))


def test_pattern_schedule():
    assert [attn_pattern_schedule(0, i) for i in range(4)] == [0, 1, 0, 1]
    assert [attn_pattern_schedule(1, i) for i in range(6)] == [0, 1, 2, 0, 1, 2]


def test_transformer_triple_residual_and_weights():
    m = FactorizedTransformer(ctx_len=16, num_heads=2, depth=3, d_model=8,
                              blocks=4, attn_stacks=1, dropout=0.0)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 8))
    params = m.init(jax.random.PRNGKey(1), x)
    out, attn_w = m.apply(params, x, collect_weights=True)
    assert out.shape == x.shape
    # Weights for first and last layer only (transformer.py:106-115).
    assert set(attn_w) == {"transformer_layer_0_attention",
                           "transformer_layer_2_attention"}


def test_transformer_variable_length_input():
    """transformer.py:135-138 — shorter-than-ctx inputs must work (sampling path)."""
    m = FactorizedTransformer(ctx_len=16, num_heads=2, depth=3, d_model=8,
                              blocks=4, attn_stacks=1, dropout=0.0)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 8))
    params = m.init(jax.random.PRNGKey(1), x)
    out, _ = m.apply(params, x[:, :3])
    assert out.shape == (2, 3, 8)
