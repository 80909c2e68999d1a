"""Classifier heads and shared fusion helpers.

BNNeck + bias-free classifier (reference: modeling/make_model.py:640-664,
weight inits at meta_arch.py:8-29) and the global-local fuse used across
assemblies (reference: make_model.py:755-757).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.activations import quick_gelu
from ..ops.linear import classifier_kernel_init
from ..ops.norm import BNNeck


class ClassifierHead(nn.Module):
    """BNNeck -> Linear(num_classes, bias=False)."""

    num_classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat: jnp.ndarray, use_running_average: bool) -> jnp.ndarray:
        x = BNNeck(name="bottleneck")(feat, use_running_average)
        logits = nn.Dense(
            self.num_classes,
            use_bias=False,
            kernel_init=classifier_kernel_init,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
            name="classifier",
        )(x.astype(jnp.float32))
        return logits


class GlobalLocalFuse(nn.Module):
    """fuse_global_local for all 3 modalities in one einsum.

    Reference keeps independent rgb/nir/tir reduce stacks
    (LayerNorm(2C) -> Linear(2C, C) -> QuickGELU, make_model.py:507-521);
    here their parameters are stacked on a leading (3,) axis.
    """

    feat_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, globals_: jnp.ndarray) -> jnp.ndarray:
        """tokens: (3, B, N, C), globals_: (3, B, C) -> (3, B, C)."""
        m, b, n, c = tokens.shape
        local = jnp.mean(tokens, axis=2)  # AdaptiveAvgPool1d(1) over tokens
        x = jnp.concatenate([globals_, local], axis=-1)  # (3, B, 2C)

        f32 = jnp.float32
        ln_scale = self.param("ln_scale", nn.initializers.ones, (m, 2 * c), f32)
        ln_bias = self.param("ln_bias", nn.initializers.zeros, (m, 2 * c), f32)
        xf = x.astype(f32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        xf = (xf - mean) * jax.lax.rsqrt(var + 1e-5)
        xf = xf * ln_scale[:, None, :] + ln_bias[:, None, :]

        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
            (m, 2 * c, c),
            f32,
        )
        bias = self.param("bias", nn.initializers.zeros, (m, c), f32)
        y = jnp.einsum(
            "mbi,mio->mbo", xf.astype(self.dtype), kernel.astype(self.dtype)
        ) + bias.astype(self.dtype)[:, None, :]
        return quick_gelu(y)
