"""Train states — explicit, checkpointable pytrees.

The TF reference hides mutable state in Keras objects (optimizer slots,
codebook Variables assigned mid-forward, metric trackers).  Here everything a
training step reads or writes is in one pytree, so Orbax checkpoints capture
the exact resumable state (including the VQ EMA statistics, the gap called out
in SURVEY.md §5 checkpoint/resume).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import optax
from flax import struct

from vae_music_tpu.nn.quantizer import CodebookState


class VQVAETrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    codebooks: Tuple[CodebookState, ...]
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, params, codebooks, tx):
        import jax.numpy as jnp

        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   opt_state=tx.init(params), codebooks=tuple(codebooks), tx=tx)


class PriorTrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any            # prior transformer (+ conditioner + label embedding)
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, params, tx):
        import jax.numpy as jnp

        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   opt_state=tx.init(params), tx=tx)
