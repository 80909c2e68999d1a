"""FRCA: Fourier Residual Channel Attention.

Reference: modeling/FRCA.py — CLC3 conv stack (:8-24), channel descriptor
GAP, vector<->grid reshape (:54-81), fp32 2-D FFT with amplitude/phase
modulation by 1x1 conv stacks (:108-137), sigmoid channel weights with a
residual, then DNRU depthwise conv + GroupNorm + ReLU (:33-51).

TPU-first: convs in NHWC; FFT forced to fp32 (matching the reference's AMP
guard, FRCA.py:121-123); the three per-modality FRCA modules keep
independent weights but the caller batches (3B, H, W, C) per module.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.norm import GroupNorm, choose_gn_groups


class CLC(nn.Module):
    """Conv k -> LeakyReLU -> Conv k (reference: FRCA.py:8-24)."""

    features: int
    kernel: int = 3
    negative_slope: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        conv = lambda name: nn.Conv(
            self.features,
            kernel_size=(self.kernel, self.kernel),
            padding="SAME",
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name=name,
        )
        x = conv("conv0")(x)
        x = jax.nn.leaky_relu(x, self.negative_slope)
        return conv("conv1")(x)


class DNRU(nn.Module):
    """Depthwise conv + GroupNorm + ReLU (reference: FRCA.py:33-51)."""

    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.channels,
            kernel_size=(3, 3),
            padding="SAME",
            feature_group_count=self.channels,
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="dwconv",
        )(x)
        x = GroupNorm(choose_gn_groups(self.channels), name="gn")(x)
        return jax.nn.relu(x)


def _grid_dims(c: int):
    hc = int(math.floor(math.sqrt(c)))
    wc = int(math.ceil(c / hc))
    return hc, wc, hc * wc - c


class FourierResidualChannelAttention(nn.Module):
    """FRCA over (B, H, W, C) feature maps (reference: FRCA.py:85-145)."""

    channels: int
    negative_slope: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.channels
        feat = CLC(c, 3, self.negative_slope, dtype=self.dtype, name="clc3")(x)

        # GAP -> channel descriptor -> near-square grid for the 2-D FFT.
        desc = jnp.mean(feat.astype(jnp.float32), axis=(1, 2))  # (B, C)
        hc, wc, pad = _grid_dims(c)
        grid = jnp.pad(desc, ((0, 0), (0, pad))).reshape(-1, hc, wc)

        spec = jnp.fft.fft2(grid)  # fp32 complex
        amp = jnp.abs(spec)
        pha = jnp.angle(spec)

        def clc1(name, v):
            conv = lambda nm: nn.Conv(
                1, kernel_size=(1, 1), use_bias=False, dtype=jnp.float32,
                param_dtype=jnp.float32, name=nm,
            )
            y = conv(f"{name}_conv0")(v[..., None])
            y = jax.nn.leaky_relu(y, self.negative_slope)
            return conv(f"{name}_conv1")(y)[..., 0]

        amp = amp * clc1("clc1_amp", amp)
        pha = pha * clc1("clc1_pha", pha)
        spec_new = amp * jnp.exp(1j * pha)
        grid_ifft = jnp.real(jnp.fft.ifft2(spec_new))
        weight = grid_ifft.reshape(-1, hc * wc)[:, :c]  # (B, C)
        weight = jax.nn.sigmoid(weight).astype(feat.dtype)

        y = feat * weight[:, None, None, :] + x
        return DNRU(c, dtype=self.dtype, name="dnru")(y)
