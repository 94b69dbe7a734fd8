"""EMA vector-quantizer bottleneck as a pure function over explicit state.

Semantics mirror /root/reference/VectorQuantizer.py:
  * codebook ``embeddings`` of shape (D, K), non-trainable (:38-44)
  * nearest-neighbour by expanded L2 ``|z|^2 + |e|^2 - 2 z.e`` + argmin (:170-186)
  * commitment loss ``beta * mean((sg(q) - z)^2)``, beta=0.25 (:97-107)
  * straight-through estimator ``q = z + sg(q - z)`` (:114)
  * EMA updates of cluster sums ``m_t`` and counts ``N_t`` with gamma=0.99 (:123-131)
  * dead-code restart: codes with running count < threshold are re-seeded from
    random (tiled+shuffled) encoder outputs of the current batch (:133-145)
  * health metrics: batch usage, running usage, batch code entropy (:149-159)

TPU-first design: the TF version mutates ``tf.Variable``s inside the forward
pass under the gradient tape; here the state is an explicit pytree threaded
through the train step, so the update is visible to XLA, trivially
checkpointable, and — under a GSPMD-sharded train step — the batch statistics
``m_t_``/``N_t_`` are *global* reductions (XLA inserts the cross-replica psum),
which is the multi-device codebook-sync requirement called out in SURVEY.md §2.2.

The distance+argmin+EMA hot path auto-dispatches (``use_pallas=None``) to
the measured winner per path: this jnp implementation for single-chip
programs (XLA's fused argmin ties/beats the Pallas kernel at the flagship
shape — numbers in ops/vq_pallas.py), and the fused kernel per-shard under
shard_map with psum'd statistics when a ``mesh`` is given.  The jnp path is
also the bit-exactness reference (tests/test_rotation_and_pallas_vq.py).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class CodebookState(NamedTuple):
    embeddings: jnp.ndarray  # (D, K) codebook, column per code
    m_t: jnp.ndarray         # (D, K) EMA cluster sums
    N_t: jnp.ndarray         # (K,)  EMA cluster counts


class VQOutput(NamedTuple):
    quantized: jnp.ndarray        # (..., D) straight-through quantized latents
    codes: jnp.ndarray            # (...,) int32 code indices
    commitment_loss: jnp.ndarray  # scalar
    state: CodebookState          # updated (or passthrough) codebook state
    metrics: dict                 # usage/entropy health metrics


def init_codebook(rng: jax.Array, embedding_dim: int, num_embeddings: int) -> CodebookState:
    # tf.random_uniform_initializer() default range (VectorQuantizer.py:25).
    emb = jax.random.uniform(rng, (embedding_dim, num_embeddings),
                             minval=-0.05, maxval=0.05, dtype=jnp.float32)
    # m_t starts as a *copy* of the codebook (VectorQuantizer.py:48-51); a
    # distinct buffer so whole-state donation in jitted steps stays legal.
    return CodebookState(embeddings=emb, m_t=emb + 0.0,
                         N_t=jnp.ones((num_embeddings,), jnp.float32))


def nearest_code(flat: jnp.ndarray, embeddings: jnp.ndarray) -> jnp.ndarray:
    """(N, D), (D, K) -> (N,) int32 argmin_k ||z_n - e_k||^2.

    One MXU matmul; the |z|^2 term is constant in k and omitted from the argmin.
    """
    similarity = jnp.dot(flat, embeddings, preferred_element_type=jnp.float32)
    distances = jnp.sum(jnp.square(embeddings), axis=0)[None, :] - 2.0 * similarity
    return jnp.argmin(distances, axis=1).astype(jnp.int32)


def codebook_lookup(codes: jnp.ndarray, embeddings: jnp.ndarray) -> jnp.ndarray:
    """(...,) int codes, (D, K) -> (..., D) embeddings (vqvae.py:246-248).

    Out-of-range codes (e.g. a sampled start token, id K) map to the zero
    vector — the behaviour of the reference's ``one_hot(zq, K) @ E^T``.
    """
    return jnp.take(embeddings.T, codes, axis=0, mode="fill", fill_value=0.0)


def rotate_to(z: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Rotation-trick forward: returns q, but gradients flow through the
    (stop-gradiented) rotation+scaling that carries z onto q, preserving the
    angular relation between the gradient and the codebook vector
    (arXiv:2410.06424 'Restructuring Vector Quantization with the Rotation
    Trick').  An alternative to the straight-through estimator.

    z, q: (N, D).  Uses R = I - (a+b)(a+b)^T/(1+a.b) + 2 b a^T with
    a = z/|z|, b = q/|q|, applied as vector ops (no DxD materialization).
    """
    eps = 1e-8
    zn = jnp.linalg.norm(z, axis=-1, keepdims=True)
    qn = jnp.linalg.norm(q, axis=-1, keepdims=True)
    a = z / (zn + eps)
    b = q / (qn + eps)
    s = a + b
    denom = 1.0 + jnp.sum(a * b, axis=-1, keepdims=True)
    # R z = z - s (s.z)/(1+a.b) + 2 b (a.z); R is a CONSTANT in the backward
    # pass (every factor detached), gradient flows through the explicit z.
    s_c = jax.lax.stop_gradient(s)
    a_c = jax.lax.stop_gradient(a)
    sz = jnp.sum(s_c * z, axis=-1, keepdims=True)
    az = jnp.sum(a_c * z, axis=-1, keepdims=True)
    rz = z - jax.lax.stop_gradient(s / (denom + eps)) * sz \
        + 2.0 * jax.lax.stop_gradient(b) * az
    # scale |q|/|z| (detached) so the forward value equals q exactly
    scale = jax.lax.stop_gradient(qn / (zn + eps))
    return scale * rz


def _restart_candidates(rng: jax.Array, flat: jnp.ndarray, k: int) -> jnp.ndarray:
    """Random batch vectors for dead-code restart: tile (if N<K) then shuffle,
    take K (VectorQuantizer.py:135-137,191-198). Returns (D, K)."""
    n = flat.shape[0]
    if n < k:
        reps = (k + n - 1) // n
        flat = jnp.tile(flat, (reps, 1))
        n = flat.shape[0]
    perm = jax.random.permutation(rng, n)[:k]
    return jnp.take(flat, perm, axis=0).T


def quantize(
    state: CodebookState,
    z_e: jnp.ndarray,
    *,
    beta: float = 0.25,
    decay: float = 0.99,
    usage_threshold: float = 1.0,
    train: bool = True,
    rng: Optional[jax.Array] = None,
    gradient_mode: str = "ste",
    use_pallas: Optional[bool] = None,
    mesh=None,
    data_axis: str = "data",
    pallas_interpret: bool = False,
) -> VQOutput:
    """Quantize encoder outputs ``z_e`` of shape (..., D).

    When ``train`` is True, also computes the EMA codebook update and the
    dead-code restart (requires ``rng``), returning the new state.

    ``gradient_mode``: 'ste' — straight-through estimator (the reference's
    VectorQuantizer.py:114); 'rotation' — the rotation trick
    (arXiv:2410.06424): same forward values, gradients carried through the
    rotation aligning z_e with its code.

    ``use_pallas``: route assignment + EMA statistics through the fused
    single-pass TPU kernel (ops/vq_pallas.py).  ``None`` (default)
    auto-dispatches to the *measured winner per path* (SURVEY.md §7 stage 3):
    the jnp path for single-chip programs — XLA's fused argmin ties or beats
    the kernel at the flagship shape (r3 lab numbers in ops/vq_pallas.py),
    and keeping jnp the default also keeps single-chip training numerics
    identical across releases — and the shard_map kernel variant when a
    ``mesh`` is given (per-shard kernel, psum'd EMA partials over
    ``data_axis``), where it prevents GSPMD from replicating the
    assignment.  ``use_pallas=True`` forces the kernel anywhere it lowers.
    """
    d, k = state.embeddings.shape
    orig_shape = z_e.shape
    flat = z_e.reshape(-1, d).astype(jnp.float32)

    if use_pallas is None:
        from vae_music_tpu.ops.vq_pallas import vq_pallas_available

        use_pallas = vq_pallas_available() and mesh is not None

    pallas_stats = None
    if use_pallas:
        from vae_music_tpu.ops.vq_pallas import (
            fused_vq_assign,
            fused_vq_assign_sharded,
        )

        if mesh is not None:
            codes, quantized, m_b, n_b = fused_vq_assign_sharded(
                jax.lax.stop_gradient(flat), state.embeddings, mesh=mesh,
                data_axis=data_axis, interpret=pallas_interpret)
        else:
            codes, quantized, m_b, n_b = fused_vq_assign(
                jax.lax.stop_gradient(flat), state.embeddings,
                interpret=pallas_interpret)
        pallas_stats = (jax.lax.stop_gradient(m_b), n_b)
    else:
        codes = nearest_code(flat, state.embeddings)
        quantized = codebook_lookup(codes, state.embeddings)

    commitment = beta * jnp.mean(jnp.square(jax.lax.stop_gradient(quantized) - flat))
    if gradient_mode == "rotation":
        quantized_st = rotate_to(flat, quantized)
    else:
        # Straight-through: gradients of `quantized` copy to the encoder output.
        quantized_st = flat + jax.lax.stop_gradient(quantized - flat)

    metrics: dict = {}
    new_state = state
    if train:
        assert rng is not None, "training quantize() needs an rng for dead-code restart"
        if pallas_stats is not None:
            m_t_batch, n_t_batch = pallas_stats
        else:
            onehot = jax.nn.one_hot(codes, k, dtype=jnp.float32)  # (N, K)
            # Batch cluster statistics — global sums under a sharded train step.
            m_t_batch = jnp.dot(flat.T, onehot,
                                preferred_element_type=jnp.float32)  # (D, K)
            n_t_batch = jnp.sum(onehot, axis=0)                      # (K,)

        m_t = decay * state.m_t + (1.0 - decay) * jax.lax.stop_gradient(m_t_batch)
        n_t = decay * state.N_t + (1.0 - decay) * n_t_batch

        usage = (n_t >= usage_threshold).astype(jnp.float32)[None, :]  # (1, K)
        random_codes = _restart_candidates(rng, jax.lax.stop_gradient(flat), k)
        embeddings = (usage * (m_t / jnp.clip(n_t, 1e-8, 1e8)[None, :])
                      + (1.0 - usage) * random_codes)
        new_state = CodebookState(embeddings=embeddings, m_t=m_t, N_t=n_t)

        code_prob = n_t_batch / jnp.sum(n_t_batch)
        metrics = {
            "batch_codebook_usage": jnp.sum((n_t_batch >= usage_threshold).astype(jnp.float32)),
            "codebook_usage": jnp.sum((n_t >= usage_threshold).astype(jnp.float32)),
            "codebook_entropy": -jnp.sum(code_prob * jnp.log(code_prob + 1e-8)),
        }

    return VQOutput(
        quantized=quantized_st.reshape(orig_shape).astype(z_e.dtype),
        codes=codes.reshape(orig_shape[:-1]),
        commitment_loss=commitment,
        state=new_state,
        metrics=metrics,
    )
