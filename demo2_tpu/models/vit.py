"""ImageNet ViT backbone ('vit_base_patch16_224' family) in flax.

Structural parity with the reference TransReID-style ViT (reference:
modeling/backbones/vit_pytorch.py:327-465):
  * overlap-capable conv patch embed (PatchEmbed_overlap, :286-324);
  * CLS token + positional embedding + SIE camera/view embedding added to ALL
    tokens, scaled by `sie_xishu` (:415-429);
  * standard pre-LN blocks (LN eps 1e-6) with exact-GELU MLPs, qkv_bias=True
    for ViT-B (:487-495), stochastic depth with a linear decay rule (:377);
  * final LayerNorm over all tokens; returns (B, N+1, C).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import MultiHeadAttention, attention_core
from ..ops.norm import LayerNorm
from ..ops.linear import torch_linear_kernel_init


class ViTAttention(nn.Module):
    """timm-style attention: packed qkv Dense + proj (vit_pytorch.py:144-170)."""

    num_heads: int
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Any = jnp.float32
    implementation: str = "xla"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        b, n, c = x.shape
        h = self.num_heads
        d = c // h
        scale = self.qk_scale if self.qk_scale is not None else d ** -0.5
        qkv = nn.Dense(
            3 * c,
            use_bias=self.qkv_bias,
            kernel_init=torch_linear_kernel_init,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="qkv",
        )(x)
        if self.implementation == "pallas" and (
            self.attn_drop == 0.0 or deterministic
        ):
            from ..ops.packed_attention import packed_self_attention

            out = packed_self_attention(qkv, h, scale)
        else:
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(b, n, h, d)
            k = k.reshape(b, n, h, d)
            v = v.reshape(b, n, h, d)
            rng = None
            if self.attn_drop > 0.0 and not deterministic:
                rng = self.make_rng("dropout")
            out = attention_core(
                q,
                k,
                v,
                scale=scale,
                dropout_rate=self.attn_drop,
                deterministic=deterministic,
                rng=rng,
                implementation=self.implementation,
            ).reshape(b, n, c)
        out = nn.Dense(
            c,
            kernel_init=torch_linear_kernel_init,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="proj",
        )(out)
        if self.proj_drop > 0.0 and not deterministic:
            out = nn.Dropout(self.proj_drop)(out, deterministic=False)
        return out


class ViTMlp(nn.Module):
    hidden: int
    out: int
    drop: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(
            self.hidden,
            kernel_init=torch_linear_kernel_init,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="fc1",
        )(x)
        x = jax.nn.gelu(x, approximate=False)
        if self.drop > 0.0 and not deterministic:
            x = nn.Dropout(self.drop)(x, deterministic=False)
        x = nn.Dense(
            self.out,
            kernel_init=torch_linear_kernel_init,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="fc2",
        )(x)
        if self.drop > 0.0 and not deterministic:
            x = nn.Dropout(self.drop)(x, deterministic=False)
        return x


def drop_path(x, rate, deterministic, rng):
    """Per-sample stochastic depth (vit_pytorch.py DropPath)."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


class ViTBlock(nn.Module):
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path_rate: float = 0.0
    dtype: Any = jnp.float32
    implementation: str = "xla"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        c = x.shape[-1]
        y = LayerNorm(epsilon=1e-6, name="norm1")(x)
        y = ViTAttention(
            self.num_heads,
            qkv_bias=self.qkv_bias,
            qk_scale=self.qk_scale,
            attn_drop=self.attn_drop,
            proj_drop=self.drop,
            dtype=self.dtype,
            implementation=self.implementation,
            name="attn",
        )(y, deterministic)
        if self.drop_path_rate > 0.0 and not deterministic:
            y = drop_path(y, self.drop_path_rate, deterministic, self.make_rng("dropout"))
        x = x + y
        y = LayerNorm(epsilon=1e-6, name="norm2")(x)
        y = ViTMlp(int(c * self.mlp_ratio), c, drop=self.drop, dtype=self.dtype, name="mlp")(
            y, deterministic
        )
        if self.drop_path_rate > 0.0 and not deterministic:
            y = drop_path(y, self.drop_path_rate, deterministic, self.make_rng("dropout"))
        return x + y


class ImageNetViT(nn.Module):
    """`Trans` equivalent (vit_pytorch.py:327-465), NHWC input."""

    img_size: Tuple[int, int] = (256, 128)
    patch_size: int = 16
    stride_size: Tuple[int, int] = (16, 16)
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.1
    camera: int = 0
    view: int = 0
    sie_xishu: float = 1.5
    dtype: Any = jnp.float32
    attn_implementation: str = "xla"
    remat: bool = False

    @property
    def grid(self) -> Tuple[int, int]:
        h, w = self.img_size
        sh, sw = self.stride_size
        num_y = (h - self.patch_size) // sh + 1
        num_x = (w - self.patch_size) // sw + 1
        return num_y, num_x

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # (B, H, W, 3)
        camera_id: Optional[jnp.ndarray] = None,  # (B,)
        view_id: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        b = x.shape[0]
        num_y, num_x = self.grid
        num_patches = num_y * num_x

        x = nn.Conv(
            self.embed_dim,
            kernel_size=(self.patch_size, self.patch_size),
            strides=tuple(self.stride_size),
            padding="VALID",
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="patch_embed_proj",
        )(x.astype(self.dtype))
        x = x.reshape(b, num_patches, self.embed_dim)

        cls_token = self.param(
            "cls_token", nn.initializers.normal(0.02), (1, 1, self.embed_dim), jnp.float32
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls_token.astype(self.dtype), (b, 1, self.embed_dim)), x],
            axis=1,
        )
        pos_embed = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1, num_patches + 1, self.embed_dim),
            jnp.float32,
        )
        x = x + pos_embed.astype(self.dtype)

        # SIE: added to ALL tokens (vit_pytorch.py:422-429).
        if self.camera > 1 and self.view > 1:
            sie = self.param(
                "sie_embed",
                nn.initializers.normal(0.02),
                (self.camera * self.view, 1, self.embed_dim),
                jnp.float32,
            )
            idx = camera_id * self.view + view_id
            x = x + self.sie_xishu * sie[idx].astype(self.dtype)
        elif self.camera > 1:
            sie = self.param(
                "sie_embed",
                nn.initializers.normal(0.02),
                (self.camera, 1, self.embed_dim),
                jnp.float32,
            )
            x = x + self.sie_xishu * sie[camera_id].astype(self.dtype)
        elif self.view > 1:
            sie = self.param(
                "sie_embed",
                nn.initializers.normal(0.02),
                (self.view, 1, self.embed_dim),
                jnp.float32,
            )
            x = x + self.sie_xishu * sie[view_id].astype(self.dtype)

        if self.drop_rate > 0.0 and not deterministic:
            x = nn.Dropout(self.drop_rate)(x, deterministic=False)

        dpr = [self.drop_path_rate * i / max(self.depth - 1, 1) for i in range(self.depth)]
        # deterministic (arg 2; arg 0 is the module) drives Python control
        # flow (drop-path gating) — it must stay static under remat.
        block_cls = (
            nn.remat(ViTBlock, static_argnums=(2,)) if self.remat else ViTBlock
        )
        for i in range(self.depth):
            x = block_cls(
                self.num_heads,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                qk_scale=self.qk_scale,
                drop=self.drop_rate,
                attn_drop=self.attn_drop_rate,
                drop_path_rate=dpr[i],
                dtype=self.dtype,
                implementation=self.attn_implementation,
                name=f"blocks_{i}",
            )(x, deterministic)
        return LayerNorm(epsilon=1e-6, name="norm")(x)
