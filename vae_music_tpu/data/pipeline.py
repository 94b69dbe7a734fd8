"""Host->device input pipeline with prefetch.

The reference feeds Keras ``model.fit`` from in-memory numpy arrays; on TPU
the input pipeline must overlap host work (shuffle/slice/transfer) with device
compute.  ``prefetch_batches`` keeps ``depth`` batches in flight: the next
batch's device_put is issued while the current step runs, and batches are
placed directly with a 'data'-axis sharding for DP training.
"""

from __future__ import annotations

import collections
from typing import Iterator, Optional

import jax
import numpy as np


def epoch_batches(
    x: np.ndarray,
    y: Optional[np.ndarray],
    batch_size: int,
    rng: np.random.Generator,
    drop_remainder: bool = True,
) -> Iterator:
    """Shuffled (x, y) slices for one epoch."""
    idx = rng.permutation(len(x))
    end = len(x) - batch_size + 1 if drop_remainder else len(x)
    for i in range(0, end, batch_size):
        sel = idx[i : i + batch_size]
        yield x[sel], (y[sel] if y is not None else None)


def prefetch_batches(batch_iter: Iterator, sharding=None, depth: int = 2):
    """Async host->device transfer with a small in-flight queue.

    device_put is asynchronous; keeping ``depth`` puts outstanding overlaps
    PCIe/host work with the previous step's device compute.
    """

    def put(batch):
        xb, yb = batch
        xb = jax.device_put(xb, sharding)
        yb = jax.device_put(yb, sharding) if yb is not None else None
        return xb, yb

    queue = collections.deque()
    for batch in batch_iter:
        queue.append(put(batch))
        if len(queue) > depth:
            yield queue.popleft()
    while queue:
        yield queue.popleft()
