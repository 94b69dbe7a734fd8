"""WaveNet-style dilated 1-D residual stacks.

Functional mirror of /root/reference/resnet.py:
  * ``ResnetConv1DBlock`` (:7-37): ReLU -> Conv1D(k=3, dilation=d, SAME)
    -> ReLU -> Conv1D(k=3, dilation=1, SAME), plus identity skip
  * ``DilatedResnet1D`` (:40-59): ``depth`` blocks with dilation
    ``factor**d`` (or cyclic ``factor**(d % cycle)``); ``reverse_dilation``
    reverses block order for decoder stacks.

TPU notes: channel-last (N, T, C) layout so the channel dim rides the lane
axis; convs lower to MXU-tiled ``lax.conv_general_dilated`` and XLA fuses the
ReLUs and the residual add into the conv epilogues.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp


class ResnetConv1DBlock(nn.Module):
    input_dim: int      # residual-stream width (block output width)
    filters: int        # bottleneck width of the dilated conv
    dilation: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.relu(x)
        h = nn.Conv(self.filters, (3,), kernel_dilation=(self.dilation,),
                    padding="SAME", dtype=self.dtype)(h)
        h = nn.relu(h)
        h = nn.Conv(self.input_dim, (3,), padding="SAME", dtype=self.dtype)(h)
        return x + h


class DilatedResnet1D(nn.Module):
    input_dim: int
    depth: int
    dilation_factor: int = 1
    reverse_dilation: bool = False
    dilation_cycle: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    def dilations(self) -> list[int]:
        def _d(cur: int) -> int:
            if self.dilation_cycle is None:
                return self.dilation_factor**cur
            return self.dilation_factor ** (cur % self.dilation_cycle)

        ds = [_d(d) for d in range(self.depth)]
        return ds[::-1] if self.reverse_dilation else ds

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for dilation in self.dilations():
            x = ResnetConv1DBlock(self.input_dim, self.input_dim,
                                  dilation=dilation, dtype=self.dtype)(x)
        return x
