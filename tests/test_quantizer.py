"""VQ bottleneck unit tests (semantics of /root/reference/VectorQuantizer.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from vae_music_tpu.nn.quantizer import (
    CodebookState,
    codebook_lookup,
    init_codebook,
    nearest_code,
    quantize,
)


def _state(d=4, k=8, seed=0):
    return init_codebook(jax.random.PRNGKey(seed), d, k)


def test_nearest_code_bruteforce():
    rng = np.random.default_rng(0)
    flat = rng.standard_normal((64, 4)).astype(np.float32)
    emb = rng.standard_normal((4, 8)).astype(np.float32)
    got = np.asarray(nearest_code(jnp.asarray(flat), jnp.asarray(emb)))
    dists = ((flat[:, :, None] - emb[None, :, :]) ** 2).sum(axis=1)
    np.testing.assert_array_equal(got, dists.argmin(axis=1))


def test_quantize_exact_codebook_vectors():
    state = _state()
    # Inputs exactly equal to codebook columns must map to themselves.
    z = state.embeddings.T[:5][None]  # (1, 5, D)
    out = quantize(state, z, train=False)
    np.testing.assert_array_equal(np.asarray(out.codes[0]), np.arange(5))
    np.testing.assert_allclose(np.asarray(out.quantized), np.asarray(z), atol=1e-7)
    assert float(out.commitment_loss) < 1e-12


def test_straight_through_gradient():
    state = _state()
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 4))

    def f(z):
        out = quantize(state, z, train=False)
        return jnp.sum(out.quantized * 3.0)

    g = jax.grad(f)(z)
    # d(quantized_st)/dz == identity (VectorQuantizer.py:114).
    np.testing.assert_allclose(np.asarray(g), 3.0, atol=1e-6)


def test_commitment_gradient_pulls_encoder_to_codes():
    state = _state()
    z = jax.random.normal(jax.random.PRNGKey(2), (2, 6, 4))

    def f(z):
        return quantize(state, z, train=False, beta=0.25).commitment_loss

    g = jax.grad(f)(z)
    out = quantize(state, z, train=False)
    flatz = z.reshape(-1, 4)
    q = codebook_lookup(out.codes.reshape(-1), state.embeddings)
    expected = 0.25 * 2.0 * (flatz - q) / flatz.size
    np.testing.assert_allclose(np.asarray(g).reshape(-1, 4), np.asarray(expected), rtol=1e-5, atol=1e-7)


def test_ema_update_matches_reference_formula():
    d, k, gamma = 3, 4, 0.99
    state = _state(d, k)
    rng = np.random.default_rng(3)
    z = jnp.asarray(rng.standard_normal((1, 50, d)).astype(np.float32))
    out = quantize(state, z, train=True, rng=jax.random.PRNGKey(0), decay=gamma)

    flat = np.asarray(z).reshape(-1, d)
    codes = np.asarray(out.codes).reshape(-1)
    onehot = np.eye(k, dtype=np.float32)[codes]
    m_t_batch = flat.T @ onehot
    n_t_batch = onehot.sum(0)
    m_t = gamma * np.asarray(state.m_t) + (1 - gamma) * m_t_batch
    n_t = gamma * np.asarray(state.N_t) + (1 - gamma) * n_t_batch
    np.testing.assert_allclose(np.asarray(out.state.m_t), m_t, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.state.N_t), n_t, rtol=1e-5, atol=1e-6)
    # Codes above threshold follow m_t / N_t (VectorQuantizer.py:144).
    used = n_t >= 1.0
    np.testing.assert_allclose(
        np.asarray(out.state.embeddings)[:, used],
        (m_t / np.clip(n_t, 1e-8, 1e8))[:, used],
        rtol=1e-5, atol=1e-6,
    )


def test_dead_code_restart_reseeds_from_batch():
    d, k = 3, 4
    # Running counts so low that decay keeps all below threshold -> all reset.
    state = CodebookState(
        embeddings=jnp.full((d, k), 100.0),
        m_t=jnp.zeros((d, k)),
        N_t=jnp.zeros((k,)),
    )
    z = jax.random.normal(jax.random.PRNGKey(4), (1, 5, d))
    out = quantize(state, z, train=True, rng=jax.random.PRNGKey(5))
    flat = np.asarray(z).reshape(-1, d)
    new_emb = np.asarray(out.state.embeddings)
    n_t = np.asarray(out.state.N_t)
    for col in range(k):
        if n_t[col] < 1.0:  # dead -> must equal SOME batch row (tiled+shuffled pick)
            diffs = np.abs(flat - new_emb[:, col][None, :]).max(axis=1)
            assert diffs.min() < 1e-5, f"dead code {col} not reseeded from batch"


def test_metrics_reported():
    state = _state()
    z = jax.random.normal(jax.random.PRNGKey(6), (2, 32, 4))
    out = quantize(state, z, train=True, rng=jax.random.PRNGKey(7))
    m = out.metrics
    assert set(m) == {"batch_codebook_usage", "codebook_usage", "codebook_entropy"}
    assert 0 <= float(m["batch_codebook_usage"]) <= 8
    assert float(m["codebook_entropy"]) >= 0


def test_quantize_under_jit_and_shard():
    """EMA statistics must be identical whether the batch lives on 1 or 8 devices."""
    import jax.sharding as shd

    state = _state(d=8, k=16, seed=1)
    z = jax.random.normal(jax.random.PRNGKey(8), (16, 10, 8))
    rng = jax.random.PRNGKey(9)

    f = jax.jit(lambda s, z: quantize(s, z, train=True, rng=rng))
    out_single = f(state, z)

    mesh = shd.Mesh(np.array(jax.devices()).reshape(8, 1), ("data", "model"))
    z_sharded = jax.device_put(z, shd.NamedSharding(mesh, shd.PartitionSpec("data")))
    out_sharded = f(state, z_sharded)

    np.testing.assert_allclose(np.asarray(out_single.state.N_t),
                               np.asarray(out_sharded.state.N_t), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out_single.state.embeddings),
                               np.asarray(out_sharded.state.embeddings), rtol=1e-4, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(out_single.codes), np.asarray(out_sharded.codes))
