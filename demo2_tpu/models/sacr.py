"""SACR: Scale-Adaptive Contextual Refinement (+ MultiModal variants).

Reference: modeling/sacr.py:27-119 (single-modality, shared across the three
streams at make_model.py:68-74), modeling/multimodal_sacr.py:23-156 (v1,
concat along tokens so atrous convs mix modalities) and :159-279 (v2, adds
modality embeddings + cross-modal self-attention).

TPU-first: convs run in NHWC; the shared single-modality SACR processes all
three streams in one (3B, H, W, C) batch; the ECA-style channel attention is
a 1-D conv expressed as an `nn.Conv` over the channel axis.
"""

from __future__ import annotations

import math
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import MultiHeadAttention
from ..ops.norm import TorchBatchNorm, LayerNorm


def eca_kernel_size(channels: int) -> int:
    """Adaptive 1-D kernel size (reference: sacr.py:76-78)."""
    k = int(abs((math.log2(channels) + 1) / 2))
    k = k if k % 2 else k + 1
    return max(k, 3)


class ConvBNReLU(nn.Module):
    features: int
    kernel: int = 1
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, use_running_average: bool = True):
        pad = self.dilation * (self.kernel // 2)
        x = nn.Conv(
            self.features,
            kernel_size=(self.kernel, self.kernel),
            kernel_dilation=(self.dilation, self.dilation),
            padding=[(pad, pad), (pad, pad)],
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)
        x = TorchBatchNorm(name="bn")(x, use_running_average)
        return jax.nn.relu(x)


class _SACRCore(nn.Module):
    """Atrous pyramid + fusion + ECA channel attention over (B, H, W, C)."""

    token_dim: int
    dilation_rates: Tuple[int, ...] = (2, 3, 4)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, use_running_average: bool = True):
        feats = [
            ConvBNReLU(self.token_dim, 1, dtype=self.dtype, name="conv1x1")(
                x, use_running_average
            )
        ]
        for i, r in enumerate(self.dilation_rates):
            feats.append(
                ConvBNReLU(
                    self.token_dim, 3, dilation=r, dtype=self.dtype, name=f"atrous_{i}"
                )(x, use_running_average)
            )
        feat = jnp.concatenate(feats, axis=-1)
        feat = ConvBNReLU(self.token_dim, 1, dtype=self.dtype, name="fusion")(
            feat, use_running_average
        )
        # ECA channel attention: GAP -> conv1d over channels -> sigmoid.
        k = eca_kernel_size(self.token_dim)
        gap = jnp.mean(feat, axis=(1, 2))  # (B, C)
        attn = nn.Conv(
            1,
            kernel_size=(k,),
            padding=[(k // 2, k // 2)],
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="channel_attn",
        )(gap[..., None])[..., 0]
        attn = jax.nn.sigmoid(attn.astype(jnp.float32)).astype(feat.dtype)
        return feat * attn[:, None, None, :]


class SACR(nn.Module):
    """Single-modality SACR over tokens (3, B, N, C), shared weights.

    The three modality streams run in one (3B, H, W, C) conv batch; the
    reference applies the same module three times sequentially
    (make_model.py:256-259).
    """

    token_dim: int
    height: int
    width: int
    dilation_rates: Tuple[int, ...] = (2, 3, 4)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, use_running_average: bool = True):
        m, b, n, c = tokens.shape
        x = tokens.reshape(m * b, self.height, self.width, c)
        out = _SACRCore(self.token_dim, self.dilation_rates, self.dtype, name="core")(
            x, use_running_average
        )
        return out.reshape(m, b, n, c)


class MultiModalSACR(nn.Module):
    """v1: concat modalities along H so atrous convs mix them (ref :103-156)."""

    token_dim: int
    height: int
    width: int
    dilation_rates: Tuple[int, ...] = (2, 3, 4)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, use_running_average: bool = True):
        m, b, n, c = tokens.shape
        # (M, B, N, C) -> (B, M*H, W, C): stack modality segments along height.
        x = tokens.transpose(1, 0, 2, 3).reshape(b, m * self.height, self.width, c)
        feat = _SACRCore(self.token_dim, self.dilation_rates, self.dtype, name="core")(
            x, use_running_average
        )
        feat = feat + ConvBNReLU(self.token_dim, 1, dtype=self.dtype, name="cross_modal")(
            feat, use_running_average
        )
        # NOTE(reference parity): the residual order is cross_modal(feat)+feat
        # (multimodal_sacr.py:145); addition is commutative so this matches.
        out = feat.reshape(b, m, n, c).transpose(1, 0, 2, 3)
        return out


class MultiModalSACRv2(nn.Module):
    """v2: + modality embeddings and cross-modal attention (ref :159-279)."""

    token_dim: int
    height: int
    width: int
    dilation_rates: Tuple[int, ...] = (2, 3, 4)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        tokens: jnp.ndarray,
        use_running_average: bool = True,
        deterministic: bool = True,
    ):
        m, b, n, c = tokens.shape
        modal_embed = self.param(
            "modal_embed", nn.initializers.truncated_normal(0.02), (m, 1, c), jnp.float32
        )
        tokens = tokens + modal_embed[:, None].astype(tokens.dtype)
        x = tokens.transpose(1, 0, 2, 3).reshape(b, m * self.height, self.width, c)
        feat = _SACRCore(self.token_dim, self.dilation_rates, self.dtype, name="core")(
            x, use_running_average
        )
        seq = feat.reshape(b, m * n, c)
        normed = LayerNorm(name="cross_modal_norm")(seq)
        seq = seq + MultiHeadAttention(num_heads=8, dtype=self.dtype, name="cross_modal_attn")(
            normed, deterministic=deterministic
        )
        return seq.reshape(b, m, n, c).transpose(1, 0, 2, 3)
