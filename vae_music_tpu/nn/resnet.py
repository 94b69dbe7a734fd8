"""WaveNet-style dilated 1-D residual stacks.

Functional mirror of /root/reference/resnet.py:
  * ``ResnetConv1DBlock`` (:7-37): ReLU -> Conv1D(k=3, dilation=d, SAME)
    -> ReLU -> Conv1D(k=3, dilation=1, SAME), plus identity skip
  * ``DilatedResnet1D`` (:40-59): ``depth`` blocks with dilation
    ``factor**d`` (or cyclic ``factor**(d % cycle)``); ``reverse_dilation``
    reverses block order for decoder stacks.

TPU notes: channel-last (N, T, C) layout so the channel dim rides the lane
axis.  Two conv implementations, selected by ``conv_impl`` (parameter trees
are identical, so checkpoints/weight ports are unaffected):

  * ``'conv'`` — ``nn.Conv`` -> ``lax.conv_general_dilated``; XLA fuses the
    ReLUs and residual adds into the conv epilogues.
  * ``'tap'``  — each Conv1D(k=3, dilation d, SAME) rewritten as three
    shifted (T, C) x (C, C') matmuls (taps at -d, 0, +d).  No conv lowering:
    the FLOPs land on the MXU as plain GEMMs.

``conv_impl=None`` (default) auto-selects the measured winner per
(backend, dtype) — see ``default_conv_impl``.  f32 taps run at
``Precision.HIGHEST`` so forcing ``'tap'`` never changes f32 numerics
beyond float-add ordering.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def default_conv_impl(dtype=jnp.float32, cin: int = 0, cout: int = 0) -> str:
    """Measured winner per (backend, dtype, width) — scripts/conv_lab.py +
    scripts/qkv_lab.py, v5e r3:

    * f32: XLA's conv is exact f32 AND faster than the exact
      (Precision.HIGHEST) tap form (0.78x), while default-precision taps
      drift 4e-2 (bf16 MXU passes) -> keep ``'conv'``.
    * bf16, wide channels (>=256 both sides): taps win — 2.06x at the
      width-512 conditioner stack, 1.76x fwd+bwd at the 1024->768 QKV
      conv -> ``'tap'``.
    * bf16, narrow channels: XLA's conv wins (its implicit im2col gives the
      MXU a 3*Cin contraction where taps contract only Cin; switching the
      width-32/64 bf16 serving stacks to taps measured 36k -> 21.4k clips/s
      end-to-end before this threshold existed) -> ``'conv'``.
    * CPU/GPU backends: ``'conv'`` (the tap rewrite targets the MXU).
    """
    if jax.default_backend() in ("cpu", "gpu", "cuda", "rocm"):
        return "conv"
    wide = min(cin, cout) >= 256 if (cin and cout) else False
    return "tap" if (jnp.dtype(dtype) == jnp.bfloat16 and wide) else "conv"


class TapConv3(nn.Module):
    """Param-compatible stand-in for ``nn.Conv(features, (3,))`` computing the
    k=3 'SAME' dilated conv as three shifted matmuls (module docstring).

    The parameter tree ({kernel: (3, Cin, Cout), bias: (Cout,)}, same
    initializers, f32 param dtype) matches ``nn.Conv`` exactly — swapping
    implementations never touches a checkpoint.
    """

    features: int
    dilation: int = 1
    dtype: jnp.dtype = jnp.float32
    padding: str = "SAME"     # 'SAME' (taps -d,0,+d) | 'CAUSAL' (taps -2d,-d,0)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param("kernel", nn.linear.default_kernel_init,
                            (3, x.shape[-1], self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), jnp.float32)
        cd = self.dtype
        # f32 dots on TPU default to one bf16 MXU pass; keep the f32 path
        # exact (PARITY.md tolerances are measured in f32).
        prec = (jax.lax.Precision.HIGHEST if cd == jnp.float32 else None)
        d, tlen = self.dilation, x.shape[1]
        t = x.astype(cd)

        def shift(off: int) -> jnp.ndarray:
            if off == 0:
                return t
            if off < 0:   # earlier timesteps: pad left, drop tail
                return jnp.pad(t, ((0, 0), (-off, 0), (0, 0)))[:, :tlen]
            return jnp.pad(t, ((0, 0), (0, off), (0, 0)))[:, off:]

        offsets = (-2 * d, -d, 0) if self.padding == "CAUSAL" else (-d, 0, d)
        out = sum(
            jnp.dot(shift(off), kernel[j].astype(cd), precision=prec,
                    preferred_element_type=jnp.float32)
            for j, off in enumerate(offsets))
        return (out + bias).astype(cd)


class ResnetConv1DBlock(nn.Module):
    input_dim: int      # residual-stream width (block output width)
    filters: int        # bottleneck width of the dilated conv
    dilation: int = 1
    dtype: jnp.dtype = jnp.float32
    conv_impl: Optional[str] = None   # None = auto | 'tap' | 'conv'

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        impl = self.conv_impl or default_conv_impl(
            self.dtype, min(self.input_dim, self.filters),
            max(self.input_dim, self.filters))
        if impl == "tap":
            conv1 = TapConv3(self.filters, dilation=self.dilation,
                             dtype=self.dtype, name="Conv_0")
            conv2 = TapConv3(self.input_dim, dtype=self.dtype, name="Conv_1")
        else:
            conv1 = nn.Conv(self.filters, (3,),
                            kernel_dilation=(self.dilation,),
                            padding="SAME", dtype=self.dtype, name="Conv_0")
            conv2 = nn.Conv(self.input_dim, (3,), padding="SAME",
                            dtype=self.dtype, name="Conv_1")
        h = nn.relu(x)
        h = conv1(h)
        h = nn.relu(h)
        h = conv2(h)
        return x + h


class DilatedResnet1D(nn.Module):
    input_dim: int
    depth: int
    dilation_factor: int = 1
    reverse_dilation: bool = False
    dilation_cycle: Optional[int] = None
    dtype: jnp.dtype = jnp.float32
    conv_impl: Optional[str] = None

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
                                  dilation=dilation, dtype=self.dtype,
                                  conv_impl=self.conv_impl)(x)
        return x
