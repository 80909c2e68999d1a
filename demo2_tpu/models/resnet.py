"""ResNet backbone (the CNN zoo's flagship member), TPU-native.

Reference: modeling/backbones/basic_cnn_params/resnet.py:157-372 —
torchvision-style ResNet with the Re-ID ``last_stride`` knob (layer4 stride
1 keeps a 16x8 map at 256x128).  The zoo (8.6k LoC: senet/osnet/nasnet/...)
is dead weight — no reference code path can construct ANY CNN backbone
(meta_arch.py:51-87 only builds ViT/CLIP; the zoo's only reachable symbol
is the fvcore op table, covered by utils/profiling.py).  The flagship
ResNet-50 is ported so the framework has a working CNN path; the rest of
the zoo stays a documented drop (SURVEY §2.4).

TPU notes: NHWC layout end-to-end (XLA's native conv layout on TPU — the
reference's NCHW would force transposes around every conv); BatchNorm
statistics live in the standard flax `batch_stats` collection like the
BNNeck heads, so the data-parallel train step's global-batch reduction
semantics apply unchanged.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class InstanceNorm(nn.Module):
    """Affine InstanceNorm2d twin (per-sample per-channel stats over H, W;
    torch default track_running_stats=False — batch statistics at eval too,
    resnet_ibn_a.py:70)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # (B, H, W, C)
        c = x.shape[-1]
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=(1, 2), keepdims=True)
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        y = (x - mean) * jax.lax.rsqrt(var + 1e-5)
        return y * scale.astype(y.dtype) + bias.astype(y.dtype)


class _ConvBN(nn.Module):
    features: int
    kernel: int
    stride: int = 1
    # "bn" | "ibn": IBN-a splits the channels, InstanceNorm on the first
    # half + BatchNorm on the rest (IBN, resnet_ibn_a.py:63-79).
    norm: str = "bn"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        pad = (self.kernel - 1) // 2
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name=name,
        )
        if self.norm == "in":  # IBN-b stem (resnet_ibn_b.py:142)
            return InstanceNorm(name="in")(x)
        if self.norm == "ibn":
            half = self.features // 2
            return jnp.concatenate(
                [InstanceNorm(name="in")(x[..., :half]), bn("bn")(x[..., half:])],
                axis=-1,
            )
        return bn("bn")(x)


class Bottleneck(nn.Module):
    """1x1 -> 3x3(stride) -> 1x1(x4) with projection shortcut
    (resnet.py:105-155); ``ibn`` swaps bn1 for the IBN-a split norm
    (resnet_ibn_a.py:84-90)."""

    planes: int
    stride: int = 1
    downsample: bool = False
    ibn: bool = False
    # IBN-b: affine IN applied AFTER the residual add, before the final relu
    # (resnet_ibn_b.py:105-108; only the last block of layers 1-2 gets it).
    ibn_b: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        identity = x
        y = nn.relu(
            _ConvBN(
                self.planes, 1, norm="ibn" if self.ibn else "bn",
                dtype=self.dtype, name="cb1",
            )(x, train)
        )
        y = nn.relu(
            _ConvBN(self.planes, 3, self.stride, dtype=self.dtype, name="cb2")(
                y, train
            )
        )
        y = _ConvBN(self.planes * 4, 1, dtype=self.dtype, name="cb3")(y, train)
        if self.downsample:
            identity = _ConvBN(
                self.planes * 4, 1, self.stride, dtype=self.dtype, name="down"
            )(x, train)
        out = y + identity
        if self.ibn_b:
            out = InstanceNorm(name="in_out")(out)
        return nn.relu(out)


class ResNet(nn.Module):
    """ResNet trunk returning the layer4 feature map (B, H', W', 2048)
    (resnet.py ``featuremaps``, :343-353)."""

    layers: Sequence[int] = (3, 4, 6, 3)  # resnet50 (:425-433)
    last_stride: int = 1  # Re-ID convention: keep the 16-stride map
    # IBN mode: False/"none" = plain; True/"a" = IBN-a (bn1 of every block in
    # layers 1-3 is the split IN/BN norm, layer4 stays plain BN,
    # resnet_ibn_a.py:198-200); "b" = IBN-b (affine-IN stem + affine IN after
    # the residual add in the LAST block of layers 1-2, resnet_ibn_b.py:
    # 142,145-150,185-191).
    ibn: Any = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        mode = {True: "a", False: "none"}.get(self.ibn, self.ibn)
        x = _ConvBN(
            64, 7, 2, norm="in" if mode == "b" else "bn",
            dtype=self.dtype, name="stem",
        )(x.astype(self.dtype), train)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        strides = (1, 2, 2, self.last_stride)
        for i, (n, s) in enumerate(zip(self.layers, strides)):
            planes = 64 * 2**i
            for j in range(n):
                x = Bottleneck(
                    planes,
                    stride=s if j == 0 else 1,
                    downsample=j == 0,
                    ibn=mode == "a" and planes != 512,
                    ibn_b=mode == "b" and i < 2 and j == n - 1,
                    dtype=self.dtype,
                    name=f"layer{i + 1}_{j}",
                )(x, train)
        return x


# name -> (layers, ibn mode)
RESNET_CONFIGS = {
    "resnet50": ((3, 4, 6, 3), False),
    "resnet101": ((3, 4, 23, 3), False),
    "resnet152": ((3, 8, 36, 3), False),
    # IBN-Net variants (resnet_ibn_a.py / resnet_ibn_b.py), the standard
    # generalization-oriented Re-ID CNNs.
    "resnet50_ibn_a": ((3, 4, 6, 3), "a"),
    "resnet50_ibn_b": ((3, 4, 6, 3), "b"),
}


def resnet_tokens(
    feature_map: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B, H, W, C) map -> (global GAP (B, C), tokens (B, H*W, C)).

    The CNN analogue of the ViT CLS/patch split used by PIFE: global = the
    reference's AdaptiveAvgPool2d (resnet.py:355-357); tokens = the
    flattened spatial map, so the fusion modules (SDTPS/DGAF/SACR/...)
    operate on CNN features unchanged.
    """
    b, h, w, c = feature_map.shape
    return jnp.mean(feature_map, axis=(1, 2)), feature_map.reshape(b, h * w, c)
