"""Best-of-N random-search sampling.

Mirror of ``random_sample`` (/root/reference/src/autoregressive/
autoregressive_fmha.py:242-302): sample ``iterations`` batches, score each
sample by the model's own token loss, keep the best-scoring sample while
rejecting degenerate ones where a single token occupies >= ``token_freq``
of the sequence.

TPU-first: all candidates of one iteration are scored in a single batched
forward; the degeneracy check is a bincount-free one-hot sum (static shapes).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp


def token_mode_fraction(tokens: jnp.ndarray, bins: int) -> jnp.ndarray:
    """(N, T) -> (N,) fraction of the sequence taken by its most frequent token."""
    onehot = jax.nn.one_hot(tokens, bins, dtype=jnp.float32)  # (N, T, bins)
    counts = jnp.sum(onehot, axis=1)                          # (N, bins)
    return jnp.max(counts, axis=-1) / tokens.shape[1]


def random_sample(
    decode_fn: Callable,           # (params, rng, ...) -> tokens (N, T+1)
    score_fn: Callable,            # (params, tokens (N,T+1)) -> (N,) mean loss/sample
    params,
    rng: jax.Array,
    *,
    bins: int,
    iterations: int = 10,
    token_freq: float = 0.50,
    decode_args: tuple = (),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (best_tokens (T+1,), best_loss scalar).

    The running best is kept on-device (jnp.where selection) — no per-
    iteration host sync; the only host transfer is the final result.  The
    reference's python-side compare loop (autoregressive_fmha.py:268-295)
    would serialize device/host on a TPU.

    If EVERY candidate across every iteration fails the ``token_freq``
    degeneracy gate, the last iteration's raw best tokens are returned with
    ``best_loss == inf`` — the masked loss, so callers can distinguish the
    fallback from a successful search (``jnp.isfinite(best_loss)``) instead
    of receiving a normal-looking finite loss for a rejected sequence
    (ADVICE r2).
    """
    best = None
    best_loss = jnp.float32(jnp.inf)
    last_best = None          # fallback if every candidate is degenerate
    for _ in range(iterations):
        rng, step = jax.random.split(rng)
        tokens = decode_fn(params, step, *decode_args)
        losses = score_fn(params, tokens)                     # (N,)
        last_best = tokens[jnp.argmin(losses)]
        # Reject degenerate candidates (single token >= token_freq of seq).
        frac = token_mode_fraction(tokens[:, 1:], bins)
        losses = jnp.where(frac >= token_freq, jnp.inf, losses)
        idx = jnp.argmin(losses)
        cand, cand_loss = tokens[idx], losses[idx]
        if best is None:
            best, best_loss = cand, cand_loss
        else:
            better = cand_loss < best_loss
            best = jnp.where(better, cand, best)
            best_loss = jnp.minimum(cand_loss, best_loss)
    if not jnp.isfinite(float(best_loss)):  # all degenerate: last batch's best
        return last_best, best_loss         # inf loss marks the fallback
    return best, best_loss


def make_score_fn(model, *, x_cond=None, y_cond=None):
    """Per-sample mean token loss of a sampled sequence under the model
    (autoregressive_fmha.py:261-267)."""

    def score(params, tokens):
        inputs, targets = tokens[:, :-1], tokens[:, 1:]
        logits, _ = model.apply(params, inputs, x_cond, y_cond) \
            if _takes_cond(model) else model.apply(params, inputs)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, targets[..., None].astype(jnp.int32),
                                   axis=-1)[..., 0]
        return jnp.mean(nll, axis=-1)

    return jax.jit(score)


def _takes_cond(model) -> bool:
    from vae_music_tpu.models.prior import FMHAPrior

    return isinstance(model, FMHAPrior)
