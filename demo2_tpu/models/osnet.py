"""OSNet backbone (Omni-Scale Network, ICCV'19), TPU-native.

Reference: modeling/backbones/basic_cnn_params/osnet.py — conv layers
:28-158, ChannelGate :162-221, OSBlock :223-277, OSNet trunk :282-440,
width factories :522-581.  Like the whole CNN zoo, it is unreachable from
any reference entry point (meta_arch.py:51-87); here it works as a PIFE
backbone: the 16-stride feature map feeds the same GAP-global +
flattened-token contract as the ResNet path.

Structure notes kept exactly:
  * LightConv3x3 = pointwise linear + DEPTHWISE 3x3 + BN + ReLU
    (feature_group_count == channels lowers to a TPU depthwise conv);
  * the four omni-scale streams (1/2/3/4 stacked light convs) are gated by
    ONE shared ChannelGate instance — parameter sharing is part of the
    design (osnet.py:253,271);
  * stage transitions are Conv1x1 + 2x2 average pooling (:360-366).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .resnet import InstanceNorm


class _ConvBNRelu(nn.Module):
    """conv + (BN|IN) + relu (ConvLayer/Conv1x1/Conv3x3, osnet.py:28-126)."""

    features: int
    kernel: int = 1
    stride: int = 1
    use_in: bool = False
    relu: bool = True
    groups: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        pad = (self.kernel - 1) // 2
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            feature_group_count=self.groups,
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)
        if self.use_in:
            x = InstanceNorm(name="in")(x)
        else:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name="bn",
            )(x)
        return nn.relu(x) if self.relu else x


class LightConv3x3(nn.Module):
    """1x1 linear + depthwise 3x3 + BN + relu (osnet.py:128-158)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(
            self.features, (1, 1), use_bias=False, dtype=self.dtype,
            param_dtype=jnp.float32, name="conv1",
        )(x)
        x = nn.Conv(
            self.features, (3, 3), padding=((1, 1), (1, 1)),
            feature_group_count=self.features, use_bias=False,
            dtype=self.dtype, param_dtype=jnp.float32, name="conv2",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, param_dtype=jnp.float32, name="bn",
        )(x)
        return nn.relu(x)


class ChannelGate(nn.Module):
    """Squeeze-and-gate mini-net (osnet.py:162-221, sigmoid activation)."""

    channels: int
    reduction: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        g = jnp.mean(x, axis=(1, 2), keepdims=True)
        g = nn.Conv(
            max(1, self.channels // self.reduction), (1, 1), use_bias=True,
            dtype=self.dtype, param_dtype=jnp.float32, name="fc1",
        )(g)
        g = nn.relu(g)
        g = nn.Conv(
            self.channels, (1, 1), use_bias=True, dtype=self.dtype,
            param_dtype=jnp.float32, name="fc2",
        )(g)
        return x * nn.sigmoid(g)


class OSBlock(nn.Module):
    """Omni-scale block: four gated multi-receptive-field streams + linear
    bottleneck + residual (osnet.py:223-277)."""

    features: int
    use_in: bool = False
    # AIN flavor (OSBlockINin, osnet_ain.py:271-304): conv3 drops its BN and
    # an affine IN is applied to x3 INSIDE the residual (before the add) —
    # vs use_in's post-add IN of the osnet_ibn flavor.
    ain: bool = False
    reduction: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        mid = self.features // self.reduction
        identity = x
        x1 = _ConvBNRelu(mid, 1, dtype=self.dtype, name="conv1")(x, train)
        gate = ChannelGate(mid, dtype=self.dtype, name="gate")  # SHARED
        streams = []
        for si in range(4):  # stream si stacks si+1 light convs
            y = x1
            for ci in range(si + 1):
                y = LightConv3x3(
                    mid, dtype=self.dtype, name=f"conv2{'abcd'[si]}_{ci}"
                )(y, train)
            streams.append(gate(y))
        x2 = sum(streams)
        if self.ain:
            x3 = nn.Conv(
                self.features, (1, 1), use_bias=False, dtype=self.dtype,
                param_dtype=jnp.float32, name="conv3",
            )(x2)
            x3 = InstanceNorm(name="in3")(x3)
        else:
            x3 = _ConvBNRelu(
                self.features, 1, relu=False, dtype=self.dtype, name="conv3"
            )(x2, train)
        if identity.shape[-1] != self.features:
            identity = _ConvBNRelu(
                self.features, 1, relu=False, dtype=self.dtype, name="downsample"
            )(x, train)
        out = x3 + identity
        if self.use_in:
            out = InstanceNorm(name="in_out")(out)
        return nn.relu(out)


# name -> (layers per stage, stage channels); osnet.py:522-581,
# osnet_ain.py:532-608.
OSNET_CONFIGS = {
    "osnet_x1_0": ((2, 2, 2), (64, 256, 384, 512)),
    "osnet_x0_5": ((2, 2, 2), (32, 128, 192, 256)),
    "osnet_x0_25": ((2, 2, 2), (16, 64, 96, 128)),
    "osnet_ain_x1_0": ((2, 2, 2), (64, 256, 384, 512)),
    "osnet_ain_x0_5": ((2, 2, 2), (32, 128, 192, 256)),
}

# osnet_ain block pattern (osnet_ain.py:536-544): per stage, per block —
# OSBlockINin/OSBlock mix, plus conv1_IN=True.
OSNET_AIN_VARIANTS = (("ain", "ain"), ("plain", "ain"), ("ain", "plain"))


class OSNet(nn.Module):
    """OSNet trunk returning the conv5 feature map (B, H/16, W/16, C3)
    (osnet.py ``featuremaps``, :412-419)."""

    layers: Sequence[int] = (2, 2, 2)
    channels: Sequence[int] = (64, 256, 384, 512)
    use_in: bool = False  # osnet_ibn variant: IN in conv1 + stage 2
    # osnet_ain (osnet_ain.py:309-449): conv1 IN + a per-(stage, block)
    # plain/ain pattern (OSNET_AIN_VARIANTS); None = all plain.
    block_variants: Any = None
    conv1_in: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        ch = self.channels
        x = _ConvBNRelu(
            ch[0], 7, 2, use_in=self.use_in or self.conv1_in,
            dtype=self.dtype, name="conv1",
        )(x.astype(self.dtype), train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for stage in range(3):
            for j in range(self.layers[stage]):
                variant = (
                    self.block_variants[stage][j]
                    if self.block_variants is not None else "plain"
                )
                x = OSBlock(
                    ch[stage + 1],
                    use_in=self.use_in and stage == 0,
                    ain=variant == "ain",
                    dtype=self.dtype,
                    name=f"conv{stage + 2}_{j}",
                )(x, train)
            if stage < 2:  # transitions after conv2 and conv3 (:360-366)
                x = _ConvBNRelu(
                    ch[stage + 1], 1, dtype=self.dtype, name=f"transition{stage + 2}"
                )(x, train)
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        return _ConvBNRelu(ch[3], 1, dtype=self.dtype, name="conv5")(x, train)
