"""AOT serving artifacts: serialize the compiled generation chain.

The reference has no serving story at all — its sampler re-traces TF graphs
in-process (/root/reference/Sampler.py).  Here the whole ancestral chain
(top prior sample -> conditioner upsample -> bottom sample -> VQ decode) is
ONE jitted program, so it can be exported with ``jax.export`` to a
self-contained StableHLO artifact: weights are embedded as constants and
``load_chain`` needs only jax — no model code, no checkpoint, no configs —
which is the right deployment unit for a fleet of inference hosts.

Notes
-----
* The artifact is platform-locked to the platforms it was lowered for
  (default: the exporting machine's backend).  Export on the serving
  platform, or pass ``platforms=("tpu",)`` / ``("cpu",)`` explicitly.
* The fused Pallas decode kernel lowers to a Mosaic ``tpu_custom_call``;
  exporting it requires opting out of the custom-call stability guarantee
  (jax.export refuses by default).  ``export_chain`` does this opt-out for
  you — the artifact is then tied to a compatible libtpu, which is the
  standard contract for kernel-bearing serving binaries.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax import export as jax_export


def export_chain(
    sampler,
    n_samples: int,
    path: str,
    *,
    with_labels: bool = True,
    platforms: Optional[Sequence[str]] = None,
) -> int:
    """Export ``sampler.compile_chain(n_samples)`` to ``path``.

    Returns the artifact size in bytes.  Signature of the exported fn:
    ``(rng_key_data (2,) uint32, y_genre (n,) int32) -> waveform (n, T, C)``
    (or without ``y_genre`` when ``with_labels=False``).
    """
    chain = sampler.compile_chain(n_samples, with_labels=with_labels)

    # Export over raw uint32 key data (typed PRNG keys don't serialize).
    if with_labels:
        fn = jax.jit(lambda key_data, y: chain(
            jax.random.wrap_key_data(key_data), y))
        args = (jnp.zeros((2,), jnp.uint32),
                jnp.zeros((n_samples,), jnp.int32))
    else:
        fn = jax.jit(lambda key_data: chain(
            jax.random.wrap_key_data(key_data)))
        args = (jnp.zeros((2,), jnp.uint32),)

    disabled = [jax_export.DisabledSafetyCheck.custom_call("tpu_custom_call"),
                jax_export.DisabledSafetyCheck.custom_call("Sharding")]
    exp = jax_export.export(fn, platforms=platforms,
                            disabled_checks=disabled)(*args)
    blob = exp.serialize()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(blob)
    return len(blob)


def load_chain(path: str):
    """Deserialize an exported chain; returns a jitted callable.

    ``fn(key_data, y_genre)`` with ``key_data = jax.random.key_data(key)``
    (or any ``(2,) uint32``).  Requires only jax + a compatible backend.
    """
    with open(path, "rb") as f:
        exp = jax_export.deserialize(f.read())
    return jax.jit(exp.call)
