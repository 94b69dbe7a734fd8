"""Rotation-trick gradient mode and the pallas-routed quantize path."""

import jax
import jax.numpy as jnp
import numpy as np

from vae_music_tpu.nn.quantizer import init_codebook, quantize, rotate_to


def test_rotate_to_forward_equals_target():
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.standard_normal((32, 8)).astype(np.float32))
    q = jnp.asarray(rng.standard_normal((32, 8)).astype(np.float32))
    out = rotate_to(z, q)
    np.testing.assert_allclose(np.asarray(out), np.asarray(q), rtol=1e-4,
                               atol=1e-4)


def test_rotation_gradient_differs_from_ste_but_same_forward():
    state = init_codebook(jax.random.PRNGKey(0), 8, 16)
    z = jax.random.normal(jax.random.PRNGKey(1), (4, 10, 8))

    outs, grads = {}, {}
    for mode in ("ste", "rotation"):
        def f(z, mode=mode):
            out = quantize(state, z, train=False, gradient_mode=mode)
            return jnp.sum(out.quantized * jnp.arange(8.0)), out.quantized

        (loss, q), g = jax.value_and_grad(f, has_aux=True)(z)
        outs[mode], grads[mode] = np.asarray(q), np.asarray(g)

    # Forward identical (both produce the codebook vectors).
    np.testing.assert_allclose(outs["ste"], outs["rotation"], rtol=1e-4,
                               atol=1e-4)
    # Backward differs: STE copies gradients, rotation re-orients them.
    assert not np.allclose(grads["ste"], grads["rotation"], atol=1e-5)
    # Rotation preserves gradient norms (it's an orthogonal map + scaling).
    n_ste = np.linalg.norm(grads["ste"].reshape(-1, 8), axis=1)
    n_rot = np.linalg.norm(grads["rotation"].reshape(-1, 8), axis=1)
    assert np.isfinite(n_rot).all() and (n_rot > 0).any()


def test_quantize_pallas_path_matches_xla():
    """use_pallas=True must produce identical codes/quantized/EMA state
    (kernel runs in interpret mode on CPU)."""
    import vae_music_tpu.ops.vq_pallas as vqp

    orig = vqp.fused_vq_assign

    def interp(flat, embeddings, **kw):
        kw["interpret"] = True
        return orig(flat, embeddings, **kw)

    vqp.fused_vq_assign = interp
    try:
        state = init_codebook(jax.random.PRNGKey(0), 8, 16)
        z = jax.random.normal(jax.random.PRNGKey(1), (2, 300, 8))
        rng = jax.random.PRNGKey(2)
        a = quantize(state, z, train=True, rng=rng, use_pallas=False)
        b = quantize(state, z, train=True, rng=rng, use_pallas=True)
        np.testing.assert_array_equal(np.asarray(a.codes), np.asarray(b.codes))
        np.testing.assert_allclose(np.asarray(a.quantized), np.asarray(b.quantized),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(a.state.N_t), np.asarray(b.state.N_t),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(a.state.embeddings),
                                   np.asarray(b.state.embeddings),
                                   rtol=1e-4, atol=1e-5)
    finally:
        vqp.fused_vq_assign = orig
