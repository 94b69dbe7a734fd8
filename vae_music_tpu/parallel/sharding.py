"""Parameter partition specs (tensor parallelism for the priors).

The conv stacks of the VQ-VAE are small (width 32-64) and stay replicated;
the prior/upsampler transformer weights are the candidates for a 'model' axis:
every 2-D kernel whose output dim divides the model-axis size is sharded
column-parallel (XLA turns the following ops into reduce-scatter/all-gather
pairs over ICI as needed).  This mirrors the "mesh-ready even if v5e-8
doesn't strictly need TP at width<=1024" note in SURVEY.md §2.2.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def prior_param_sharding(mesh: Mesh, params: Any) -> Any:
    """PartitionSpec pytree for prior params: column-parallel kernels on 'model'."""
    model_size = mesh.shape.get("model", 1)

    def spec_for(path, leaf):
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        if model_size > 1 and leaf.ndim >= 2 and "kernel" in name:
            if leaf.shape[-1] % model_size == 0:
                return NamedSharding(mesh, P(*([None] * (leaf.ndim - 1) + ["model"])))
        if model_size > 1 and leaf.ndim == 2 and "embedding" in name.lower():
            if leaf.shape[-1] % model_size == 0:
                return NamedSharding(mesh, P(None, "model"))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_pytree(tree: Any, shardings: Any) -> Any:
    """Device-put every leaf with its sharding."""
    return jax.tree_util.tree_map(jax.device_put, tree, shardings)
