"""Per-host input sharding for multi-host (multi-process) training.

The reference is single-process (SURVEY.md §2.2); its data path has no
multi-host story.  Here the train steps are written over the *global* batch,
so on a multi-host mesh each host must contribute only the rows that live on
its local chips.  ``put_global_batch`` assembles the global logical array
from process-local data with ``jax.make_array_from_process_local_data`` —
no cross-host transfer, each host's rows land on its own devices — and
degrades to a plain ``jax.device_put`` in the single-process case (tests,
the one-chip TPU environment).

Recipe (see docs/PARALLELISM.md):

    mesh = create_mesh()                       # all chips, 'data' axis
    sharding = batch_sharding(mesh)
    my_rows = host_local_rows(global_batch_size)
    for step_batch in my_loader(batch_rows=my_rows):     # per-host loader
        xb = put_global_batch(step_batch, sharding)      # global (N, ...) array
        state, metrics = train_step(state, xb, rng)      # unchanged step
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np


def host_local_rows(global_batch_size: int) -> int:
    """Rows of the global batch THIS process must supply (equal split)."""
    n_proc = jax.process_count()
    assert global_batch_size % n_proc == 0, (
        f"global batch {global_batch_size} must divide process count {n_proc}")
    return global_batch_size // n_proc


def host_local_slice(n_examples: int, seed: int, epoch: int) -> np.ndarray:
    """This process's disjoint slice of a shared per-epoch permutation.

    Every host seeds the same RNG, so the permutation is identical
    everywhere; each takes its ``process_index``-th contiguous chunk —
    together they cover the epoch exactly once.  When ``n_examples`` is not
    divisible by the process count, the permutation WRAPS (cyclic repeat)
    so that every process still yields the same ceil-divided number of rows
    (collective-safe) and every example appears at least once per epoch; the
    trailing chunks then contain a few duplicates from the front of the
    permutation.  (r2 behaviour silently dropped the remainder every epoch —
    ADVICE r2; the chosen semantics are pinned by
    tests/test_multichip.py::test_host_local_slice_covers_remainder.)
    """
    perm = np.random.default_rng((seed, epoch)).permutation(n_examples)
    n_proc = jax.process_count()
    per = -(-n_examples // n_proc)      # ceil: equal rows on every process
    i = jax.process_index()
    if n_examples % n_proc == 0:
        return perm[i * per:(i + 1) * per]
    return np.resize(perm, per * n_proc)[i * per:(i + 1) * per]


def put_global_batch(batch, sharding, *,
                     use_process_local: Optional[bool] = None):
    """Build the global sharded array for a train step.

    ``batch``: single-process — the full global batch; multi-process — only
    this host's ``host_local_rows`` rows.  ``use_process_local`` overrides
    the process-count autodetection (tests force the
    make_array_from_process_local_data path on one process).
    """
    if use_process_local is None:
        use_process_local = jax.process_count() > 1
    if not use_process_local:
        return jax.device_put(batch, sharding)
    return jax.make_array_from_process_local_data(sharding, np.asarray(batch))
