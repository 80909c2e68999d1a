"""Trimodal-LIF: quality-aware multi-modal fusion.

Reference: modeling/trimodal_lif.py — three small conv `QualityPredictor`
nets (:45-75), self-supervised quality ground truth (RGB luminance, NIR
Laplacian local variance, TIR local std; :78-128), MSE loss (:217-240), and
patch-level reweighting wired in the model (make_model.py:264-290).

TPU-first: the three predictors keep independent weights but run as one
batched conv pass over the (3B, H, W, 3) stack via a leading-axis vmap'd
parameterization; GT statistics are pure jnp (reduce_window average pools +
`jax.image.resize` bilinear, matching F.interpolate align_corners=False).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.norm import TorchBatchNorm


def _avg_pool(x, window, stride, pad):
    """Average pool over (B, H, W, C) with count_include_pad=True (torch)."""
    summed = jax.lax.reduce_window(
        x,
        0.0,
        jax.lax.add,
        (1, window, window, 1),
        (1, stride, stride, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)],
    )
    return summed / (window * window)


class ConvBNSiLU(nn.Module):
    features: int
    kernel: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, use_running_average: bool = True):
        x = nn.Conv(
            self.features,
            kernel_size=(self.kernel, self.kernel),
            padding="SAME",
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)
        x = TorchBatchNorm(name="bn")(x, use_running_average)
        return jax.nn.silu(x)


class QualityPredictor(nn.Module):
    """Conv stack -> (B, H/8, W/8, 1) quality map (reference: :45-75)."""

    mid_channels: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, use_running_average: bool = True):
        x = ConvBNSiLU(32, dtype=self.dtype, name="c0")(x, use_running_average)
        x = _avg_pool(x, 2, 2, 0)
        x = ConvBNSiLU(self.mid_channels, dtype=self.dtype, name="c1")(x, use_running_average)
        x = _avg_pool(x, 2, 2, 0)
        x = ConvBNSiLU(self.mid_channels, dtype=self.dtype, name="c2")(x, use_running_average)
        x = _avg_pool(x, 2, 2, 0)
        x = nn.Conv(
            1, kernel_size=(1, 1), dtype=self.dtype, param_dtype=jnp.float32, name="head"
        )(x)
        return jax.nn.relu(x)


class TrimodalLIF(nn.Module):
    """Three independent predictors over the modality stack."""

    mid_channels: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray, use_running_average: bool = True):
        """images: (B, 3, H, W, 3) -> quality maps (3, B, h, w, 1)."""
        names = ("rgb", "nir", "tir")
        return jnp.stack(
            [
                QualityPredictor(self.mid_channels, self.dtype, name=f"{nm}_predictor")(
                    images[:, i], use_running_average
                )
                for i, nm in enumerate(names)
            ]
        )


# ---------------- self-supervised quality ground truth ----------------------


def _resize_bilinear(x, size):
    """F.interpolate(..., mode='bilinear', align_corners=False) equivalent.

    torch's interpolate does NOT antialias (2-tap kernel even when
    minifying), whereas jax.image.resize does — so the sampling is done
    explicitly here for exact parity with the reference
    (make_model.py:275-277, trimodal_lif.py GT resizes).
    """
    b, h, w, c = x.shape
    oh, ow = size

    def axis_weights(n_in, n_out):
        centers = (jnp.arange(n_out) + 0.5) * (n_in / n_out) - 0.5
        i0 = jnp.clip(jnp.floor(centers), 0, n_in - 1).astype(jnp.int32)
        i1 = jnp.clip(i0 + 1, 0, n_in - 1)
        frac = jnp.clip(centers - jnp.floor(centers), 0.0, 1.0)
        frac = jnp.where(centers < 0, 0.0, frac)
        return i0, i1, frac.astype(x.dtype)

    y0, y1, fy = axis_weights(h, oh)
    x0, x1, fx = axis_weights(w, ow)
    top = x[:, y0][:, :, x0] * (1 - fx)[None, None, :, None] + \
        x[:, y0][:, :, x1] * fx[None, None, :, None]
    bot = x[:, y1][:, :, x0] * (1 - fx)[None, None, :, None] + \
        x[:, y1][:, :, x1] * fx[None, None, :, None]
    return top * (1 - fy)[None, :, None, None] + bot * fy[None, :, None, None]


def rgb_quality(rgb: jnp.ndarray, target: Tuple[int, int]) -> jnp.ndarray:
    """Luminance (ITU-R BT.601) (reference: :82-86).  rgb: (B, H, W, 3)."""
    lum = 0.299 * rgb[..., 0:1] + 0.587 * rgb[..., 1:2] + 0.114 * rgb[..., 2:3]
    return _resize_bilinear(lum, target)


def nir_quality(nir: jnp.ndarray, target: Tuple[int, int], kernel: int = 15) -> jnp.ndarray:
    """Laplacian local variance, max-normalized (reference: :89-111)."""
    g = jnp.mean(nir, axis=-1, keepdims=True)
    kern = jnp.asarray([[0, 1, 0], [1, -4, 1], [0, 1, 0]], g.dtype).reshape(3, 3, 1, 1)
    lap = jax.lax.conv_general_dilated(
        g, kern, (1, 1), [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    pad = kernel // 2
    mean = _avg_pool(lap, kernel, 1, pad)
    mean_sq = _avg_pool(lap ** 2, kernel, 1, pad)
    var = jnp.clip(mean_sq - mean ** 2, 0.0)
    q = _resize_bilinear(var, target)
    return q / (jnp.max(q, axis=(1, 2), keepdims=True) + 1e-6)


def tir_quality(tir: jnp.ndarray, target: Tuple[int, int], kernel: int = 15) -> jnp.ndarray:
    """Local standard deviation, max-normalized (reference: :114-128)."""
    g = jnp.mean(tir, axis=-1, keepdims=True)
    pad = kernel // 2
    mean = _avg_pool(g, kernel, 1, pad)
    mean_sq = _avg_pool(g ** 2, kernel, 1, pad)
    std = jnp.sqrt(jnp.clip(mean_sq - mean ** 2, 0.0) + 1e-6)
    q = _resize_bilinear(std, target)
    return q / (jnp.max(q, axis=(1, 2), keepdims=True) + 1e-6)


def lif_loss(quality_maps: jnp.ndarray, images: jnp.ndarray) -> jnp.ndarray:
    """MSE vs self-supervised GT (reference: TrimodalLIFLoss :217-240).

    quality_maps: (3, B, h, w, 1); images: (B, 3, H, W, 3).
    """
    target = quality_maps.shape[2:4]
    imgs = images.astype(jnp.float32)
    gt = jnp.stack(
        [
            rgb_quality(imgs[:, 0], target),
            nir_quality(imgs[:, 1], target),
            tir_quality(imgs[:, 2], target),
        ]
    )
    q = quality_maps.astype(jnp.float32)
    return sum(jnp.mean(jnp.square(q[i] - gt[i])) for i in range(3))


def lif_reweight(
    patches: jnp.ndarray,  # (3, B, N, C)
    quality_maps: jnp.ndarray,  # (3, B, h, w, 1)
    patch_grid: Tuple[int, int],
    temperature: float,
) -> jnp.ndarray:
    """Patch-level softmax reweighting (reference: make_model.py:271-290)."""
    m, b, n, c = patches.shape
    q = _resize_bilinear(
        quality_maps.reshape(m * b, *quality_maps.shape[2:]), patch_grid
    ).reshape(m, b, n)
    w = jax.nn.softmax(q.astype(jnp.float32) * temperature, axis=0)
    return patches * w[..., None].astype(patches.dtype)
