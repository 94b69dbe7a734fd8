"""PixelCNN autoregressive prior over VQ code grids.

Covers the reference's PixelCNN lineage
(/root/reference/notebooks/tf_2_0_keras_vq_vae.ipynb cells 35-92):
  * masked convolutions, mask type 'A' (excludes the center pixel, first
    layer) and 'B' (includes it, later layers) — cell 35
  * residual blocks: 1x1 conv -> masked-B 3x3 -> 1x1 conv + skip — cell 38
  * trained on integer code grids with sparse CE — cells 42-44
  * class-conditional variant (label embedding added per-position bias) —
    the tfp class-conditional PixelCNN of cells 60-92
  * ancestral raster-scan sampling — cell 50, here as a jitted ``lax.scan``
    over positions.

Works on 2-D grids (N, H, W) (the notebook's MNIST code grids) and 1-D token
sequences (N, T) (audio code grids, treated as H=1).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vae_music_tpu.sample.decode import SampleMode, sample_token


def pixelcnn_mask(kernel_hw: Tuple[int, int], in_ch: int, out_ch: int,
                  mask_type: str) -> np.ndarray:
    """Raster-scan causal mask for a conv kernel (kh, kw, in, out)."""
    kh, kw = kernel_hw
    mask = np.zeros((kh, kw, in_ch, out_ch), np.float32)
    ch, cw = kh // 2, kw // 2
    mask[:ch] = 1.0                  # rows above center
    mask[ch, :cw] = 1.0              # left of center
    if mask_type == "B":
        mask[ch, cw] = 1.0           # include center
    elif mask_type != "A":
        raise ValueError(mask_type)
    return mask


class MaskedConv2D(nn.Module):
    features: int
    kernel: Tuple[int, int]
    mask_type: str  # 'A' | 'B'
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (*self.kernel, in_ch, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mask = jnp.asarray(pixelcnn_mask(self.kernel, in_ch, self.features,
                                         self.mask_type))
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), (kernel * mask).astype(self.dtype),
            window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + bias


class PixelCNNResidualBlock(nn.Module):
    filters: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.relu(x)
        h = nn.Conv(self.filters, (1, 1), dtype=self.dtype)(h)
        h = nn.relu(h)
        h = MaskedConv2D(self.filters, (3, 3), "B", dtype=self.dtype)(h)
        h = nn.relu(h)
        h = nn.Conv(self.filters * 2, (1, 1), dtype=self.dtype)(h)
        return x + h


class PixelCNN(nn.Module):
    """Categorical PixelCNN over integer code grids."""

    bins: int                  # codebook size K
    filters: int = 128
    residual_blocks: int = 2
    top_convs: int = 2
    kernel: Tuple[int, int] = (7, 7)
    num_classes: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, codes: jnp.ndarray,
                 labels: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """codes: (N, H, W) or (N, T) ints -> logits (..., bins)."""
        squeeze_1d = codes.ndim == 2
        if squeeze_1d:
            codes = codes[:, None, :]  # (N, 1, T)
        x = jax.nn.one_hot(codes, self.bins, dtype=self.dtype)
        x = MaskedConv2D(self.filters * 2, self.kernel, "A", dtype=self.dtype)(x)
        if self.num_classes is not None and labels is not None:
            cls = nn.Embed(self.num_classes, self.filters * 2,
                           dtype=self.dtype, name="class_embedding")(labels)
            x = x + cls[:, None, None, :]
        for _ in range(self.residual_blocks):
            x = PixelCNNResidualBlock(self.filters, dtype=self.dtype)(x)
        for _ in range(self.top_convs):
            x = nn.relu(x)
            x = MaskedConv2D(self.filters, (1, 1), "B", dtype=self.dtype)(x)
        logits = nn.Conv(self.bins, (1, 1), dtype=self.dtype)(x)
        if squeeze_1d:
            logits = logits[:, 0]
        return logits


def pixelcnn_loss(model: PixelCNN, params, codes, labels=None) -> jnp.ndarray:
    """Mean sparse CE over all grid positions (notebook cell 42)."""
    logits = model.apply(params, codes, labels)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, codes[..., None].astype(jnp.int32),
                               axis=-1)[..., 0]
    return jnp.mean(nll)


def pixelcnn_log_prob(model: PixelCNN, params, codes,
                      labels=None) -> jnp.ndarray:
    """Per-sample log-likelihood ``log p(codes)`` — the scoring entry point
    of ``tfp.distributions.PixelCNN.log_prob`` (tf_2_0_keras_vq_vae.ipynb
    cells 60-92): the sum over grid positions of the autoregressive
    categorical log-probabilities.  codes (N, H, W) or (N, T) -> (N,).
    """
    logits = model.apply(params, codes, labels)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    token_logp = jnp.take_along_axis(
        logp, codes[..., None].astype(jnp.int32), axis=-1)[..., 0]
    return jnp.sum(token_logp.reshape(token_logp.shape[0], -1), axis=-1)


def make_pixelcnn_sampler(model: PixelCNN, grid_shape: Tuple[int, ...],
                          n_samples: int, *, mode: SampleMode = SampleMode.GUMBEL,
                          temperature: float = 1.0, top_k: int = 0,
                          top_p: float = 1.0):
    """Raster-scan ancestral sampling as a jitted lax.scan (notebook cell 50).

    grid_shape: (H, W) or (T,).  Each step re-runs the (fully-convolutional)
    network and conditions on all previously drawn positions — the PixelCNN
    receptive-field contract.
    """
    squeeze_1d = len(grid_shape) == 1
    h, w = (1, grid_shape[0]) if squeeze_1d else grid_shape

    def sampler(params, rng, labels=None):
        def step(carry, pos):
            grid, step_rng = carry
            r, c = pos // w, pos % w
            inp = grid if not squeeze_1d else grid[:, 0]
            logits = model.apply(params, inp, labels)
            if squeeze_1d:
                logits = logits[:, None]
            logit = jax.lax.dynamic_slice(
                logits, (0, r, c, 0), (n_samples, 1, 1, logits.shape[-1]))[:, 0, 0]
            step_rng, sub = jax.random.split(step_rng)
            tok = sample_token(sub, logit, mode, temperature, top_k, top_p)
            grid = jax.lax.dynamic_update_slice(
                grid, tok[:, None, None].astype(grid.dtype), (0, r, c))
            return (grid, step_rng), None

        grid0 = jnp.zeros((n_samples, h, w), jnp.int32)
        (grid, _), _ = jax.lax.scan(step, (grid0, rng), jnp.arange(h * w))
        return grid[:, 0] if squeeze_1d else grid

    return jax.jit(sampler)
