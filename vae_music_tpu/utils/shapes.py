"""Small shape utilities (analogue of /root/reference/utils/tf_utils.py:14-20).

In JAX all shapes under jit are static, so ``shape_list`` collapses to ``x.shape``;
what remains useful is an assertion helper mirroring the reference's
``tf.debugging.assert_equal`` shape contracts sprinkled through hot paths.
"""

from __future__ import annotations

import math
from typing import Sequence


def prod(xs: Sequence[int]) -> int:
    return math.prod(xs)


def compare_t(t1, t2):
    """Count and locate differing elements (tf_utils.py:9-11)."""
    import jax.numpy as jnp

    not_equal = (jnp.asarray(t1) != jnp.asarray(t2)).astype(jnp.float32)
    return jnp.sum(not_equal), not_equal


def assert_shape(x, expected: Sequence[int | None], name: str = "tensor") -> None:
    """Static shape contract. ``None`` entries are wildcards."""
    shape = tuple(x.shape)
    if len(shape) != len(expected):
        raise ValueError(f"{name}: rank mismatch, got {shape}, expected {tuple(expected)}")
    for got, want in zip(shape, expected):
        if want is not None and got != want:
            raise ValueError(f"{name}: shape mismatch, got {shape}, expected {tuple(expected)}")
