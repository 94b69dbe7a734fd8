"""Device mesh + sharding helpers.

The reference has no distribution story (single-device ``model.fit``,
SURVEY.md §2.2).  Here parallelism is GSPMD-first: one global program,
``jax.sharding.Mesh`` with ('data', 'model') axes over ICI, sharding
annotations on inputs/params, and XLA inserts the collectives — gradient
reductions and the VQ codebook's EMA batch statistics become cross-replica
psums automatically because the train step is written over the global batch.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    shape: Optional[Tuple[int, int]] = None,
    axis_names: Sequence[str] = ("data", "model"),
    devices=None,
) -> Mesh:
    """Build a ('data', 'model') mesh. Defaults to all devices on 'data'."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n, 1)
    assert shape[0] * shape[1] == n, f"mesh {shape} != {n} devices"
    if n == 1:
        arr = np.array(devices).reshape(shape)
    else:
        arr = mesh_utils.create_device_mesh(shape, devices=devices)
    return Mesh(arr, axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
