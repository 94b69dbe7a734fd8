"""Positional encodings and the Noam LR schedule.

Mirrors /root/reference/src/transformer/multi_head_attention.py:
  * ``positional_encoding`` (:37-50): sinusoidal table
  * ``PositionalEmbedding`` (:53-79): trainable table sliced to seq_len
  * ``CustomSchedule`` (:82-101): rsqrt(d_model) * min(rsqrt(step), step*warmup^-1.5)
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np
import optax


def sinusoidal_encoding(position: int, d_model: int) -> jnp.ndarray:
    """(1, position, d_model) sinusoidal table."""
    pos = np.arange(position)[:, None].astype(np.float32)
    i = np.arange(d_model)[None, :].astype(np.float32)
    angle_rates = 1.0 / np.power(10000.0, (2.0 * (i // 2)) / float(d_model))
    angles = pos * angle_rates
    angles[:, 0::2] = np.sin(angles[:, 0::2])
    angles[:, 1::2] = np.cos(angles[:, 1::2])
    return jnp.asarray(angles[None, ...], dtype=jnp.float32)


class PositionalEmbedding(nn.Module):
    num_embeddings: int
    embedding_dim: int

    @nn.compact
    def __call__(self, seq_len: int) -> jnp.ndarray:
        table = self.param(
            "embeddings",
            nn.initializers.uniform(scale=0.05),  # tf.random_uniform_initializer()
            (self.num_embeddings, self.embedding_dim),
        )
        return table[None, :seq_len, :]


def noam_schedule(d_model: int, warmup_steps: int = 4000) -> optax.Schedule:
    def schedule(step):
        step = jnp.maximum(step.astype(jnp.float32), 1.0)
        return jnp.float32(d_model) ** -0.5 * jnp.minimum(
            step**-0.5, step * warmup_steps**-1.5
        )

    return schedule
