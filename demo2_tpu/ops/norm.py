"""Normalization layers with PyTorch-compatible semantics.

The reference relies on torch BatchNorm1d/2d in BNNecks (reference:
modeling/make_model.py:640-664), ATMoE experts (modeling/moe/AttnMOE.py:16,30)
and conv stacks (modeling/sacr.py, modeling/trimodal_lif.py).  Flax's
`nn.BatchNorm` differs from torch in two ways that matter for weight-porting
parity: torch updates the running variance with the *unbiased* batch variance,
and uses momentum 0.1 in the torch convention (new = (1-m)*old + m*batch).
This module reproduces torch exactly; statistics are accumulated in fp32.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class TorchBatchNorm(nn.Module):
    """BatchNorm over the last (feature) axis, torch semantics.

    Works for (B, C) inputs (BatchNorm1d) and (B, H, W, C) inputs
    (BatchNorm2d in NHWC layout).  Normalization uses the biased batch
    variance; running-var updates use the unbiased variance, matching torch.
    """

    momentum: float = 0.1  # torch convention
    epsilon: float = 1e-5
    use_scale: bool = True
    use_bias: bool = True
    dtype: Optional[Any] = None
    scale_init: Any = nn.initializers.ones
    bias_init: Any = nn.initializers.zeros

    @nn.compact
    def __call__(self, x: jnp.ndarray, use_running_average: bool) -> jnp.ndarray:
        features = x.shape[-1]
        reduce_axes = tuple(range(x.ndim - 1))
        dtype = self.dtype or x.dtype

        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((features,), jnp.float32)
        )

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=reduce_axes)
            # Centered form: E[(x-mean)^2].  The E[x^2]-E[x]^2 form can go
            # NEGATIVE under fused f32 reductions when |mean| >> std (the
            # hazard the LayerNorm below documents), NaN-ing rsqrt and
            # poisoning the running stats.
            var = jnp.mean(jnp.square(xf - mean), axis=reduce_axes)
            n = 1
            for a in reduce_axes:
                n *= x.shape[a]
            unbiased = var * (n / max(n - 1, 1))
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = (1.0 - m) * ra_mean.value + m * mean
                ra_var.value = (1.0 - m) * ra_var.value + m * unbiased

        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.epsilon)
        if self.use_scale:
            scale = self.param("scale", self.scale_init, (features,), jnp.float32)
            y = y * scale
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (features,), jnp.float32)
            y = y + bias
        return y.astype(dtype)


class BNNeck(nn.Module):
    """BNNeck: BatchNorm1d with a permanently-zero (frozen) bias.

    The reference freezes the BN bias at its zero init
    (`bottleneck.bias.requires_grad_(False)`, reference:
    modeling/make_model.py:644-646), which is equivalent to a bias-free BN.
    """

    @nn.compact
    def __call__(self, x: jnp.ndarray, use_running_average: bool) -> jnp.ndarray:
        return TorchBatchNorm(use_bias=False, name="bn")(x, use_running_average)


class GroupNorm(nn.Module):
    """GroupNorm over (B, H, W, C), torch semantics (per-sample stats)."""

    num_groups: int
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        g = self.num_groups
        xf = x.astype(jnp.float32).reshape(b, h, w, g, c // g)
        mean = jnp.mean(xf, axis=(1, 2, 4), keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=(1, 2, 4), keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y.reshape(b, h, w, c)
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return ((y * scale) + bias).astype(x.dtype)


def choose_gn_groups(channels: int) -> int:
    """Largest group count <= 32 dividing C (reference: modeling/FRCA.py:26-31)."""
    for g in (32, 16, 8, 4, 2, 1):
        if channels % g == 0:
            return g
    return 1


class LayerNorm(nn.Module):
    """LayerNorm with fp32 statistics (CLIP casts up; reference:
    clip/model.py:152-160).

    The reductions accumulate in fp32 via the reduction dtype WITHOUT
    materializing an fp32 copy of the activation — for bf16 inputs the
    normalize arithmetic stays in bf16 (f32 per-row scalars broadcast in),
    which is the standard mixed-precision LN and saves the 2x HBM traffic of
    fp32 intermediates on the training path.  For fp32 inputs the math is
    numerically equivalent to the previous full-fp32 form within 1 ulp (the
    d*(rstd*scale)+bias regrouping changes fp32 rounding; parity suite holds).
    """

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dtype = x.dtype
        features = x.shape[-1]
        mean = jnp.mean(x, axis=-1, keepdims=True, dtype=jnp.float32)
        d = x - mean.astype(dtype)
        # Centered two-pass variance (non-negative by construction — the
        # E[x^2]-E[x]^2 form can go negative under fused reductions and NaN
        # the rsqrt; see the SDTPS z-score incident).
        var = jnp.mean(jnp.square(d), axis=-1, keepdims=True, dtype=jnp.float32)
        rstd = jax.lax.rsqrt(var + self.epsilon)
        scale = self.param("scale", nn.initializers.ones, (features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,), jnp.float32)
        y = d * (rstd.astype(dtype) * scale.astype(dtype)) + bias.astype(dtype)
        return y
