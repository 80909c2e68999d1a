"""T2T-ViT backbone ('t2t_vit_t_14' / 't2t_vit_t_24'), TPU-native.

Reference: modeling/backbones/t2t.py (T2T_module :48-113, T2T_ViT :115-247,
factory fns :345-360, :373-388), token_transformer.py (the tokens-to-token
re-structurization transformer), transformer_block.py (main-body Block +
sinusoid table :78-88).

These names are registered in the reference factory
(modeling/make_model.py:963-970) but its `build_transformer` only ever
constructs 'vit_base_patch16_224' or 'ViT-B-16' (meta_arch.py:51-87) — with
a t2t name it never sets `self.base` and crashes.  Here the hook actually
WORKS: PIFE dispatches to this module, which shares the stacked tri-modal
batching, SIE handling, and the ViTBlock main body with the other backbones.

TPU notes:
  * torch `nn.Unfold` becomes `lax.conv_general_dilated_patches`, whose
    feature ordering is verified bit-identical to unfold's (C-major,
    kernel-position-minor) in tests/test_t2t_parity.py.
  * The tokens-to-token stages run at 2048/512 tokens with a single head —
    a quadratic-attention im2col pyramid.  It lowers to three big MXU
    matmul chains; no Pallas needed at these sizes.
  * The sinusoid positional table (transformer_block.py:78-88) is a
    compile-time numpy constant, not a parameter (requires_grad=False in
    the reference).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.linear import torch_linear_kernel_init
from ..ops.norm import LayerNorm
from .vit import ViTBlock, ViTMlp


def sinusoid_encoding(n_position: int, d_hid: int) -> np.ndarray:
    """Sinusoid position table (reference: transformer_block.py:78-88)."""
    pos = np.arange(n_position)[:, None]
    hid = np.arange(d_hid)[None, :]
    angle = pos / np.power(10000, 2 * (hid // 2) / d_hid)
    table = np.where(hid % 2 == 0, np.sin(angle), np.cos(angle))
    return table[None].astype(np.float32)  # (1, n_position, d_hid)


def _unfold(x_nchw: jnp.ndarray, k: int, s: int, p: int) -> jnp.ndarray:
    """torch F.unfold twin: (B, C, H, W) -> (B, L, C*k*k) token-major."""
    patches = jax.lax.conv_general_dilated_patches(
        x_nchw, filter_shape=(k, k), window_strides=(s, s), padding=((p, p), (p, p))
    )  # (B, C*k*k, H', W') — ordering torch-identical (see module docstring)
    b, f = patches.shape[:2]
    hw = patches.shape[2:]
    return patches.reshape(b, f, hw[0] * hw[1]).transpose(0, 2, 1), hw


class TokenTransformer(nn.Module):
    """Tokens-to-token transformer stage (token_transformer.py:13-62).

    Single-head attention projecting dim -> in_dim with the reference's two
    quirks kept: the softmax scale uses the INPUT dim (:19-20) even though
    q/k live in in_dim, and the residual skips from V (:43-44) because the
    input/output widths differ.
    """

    in_dim: int
    mlp_ratio: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        dim = x.shape[-1]
        scale = float(dim) ** -0.5  # head_dim == dim at num_heads=1
        y = LayerNorm(epsilon=1e-5, name="norm1")(x)
        qkv = nn.Dense(
            3 * self.in_dim, use_bias=False, kernel_init=torch_linear_kernel_init,
            dtype=self.dtype, param_dtype=jnp.float32, name="qkv",
        )(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        logits = jnp.einsum(
            "bnd,bmd->bnm", q * scale, k, preferred_element_type=jnp.float32
        )
        attn = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
        out = jnp.einsum("bnm,bmd->bnd", attn, v)
        out = nn.Dense(
            self.in_dim, kernel_init=torch_linear_kernel_init,
            dtype=self.dtype, param_dtype=jnp.float32, name="proj",
        )(out)
        x = v + out  # V-skip
        y = LayerNorm(epsilon=1e-5, name="norm2")(x)
        x = x + ViTMlp(
            int(self.in_dim * self.mlp_ratio), self.in_dim,
            dtype=self.dtype, name="mlp",
        )(y, deterministic)
        return x


class T2TModule(nn.Module):
    """Tokens-to-token encoding pyramid, 'transformer' type
    (t2t.py:48-113): unfold(7,4,2) -> T2T stage -> unfold(3,2,1) -> T2T
    stage -> unfold(3,2,1) -> linear projection."""

    embed_dim: int = 384
    token_dim: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        # NHWC -> NCHW so the unfold feature ordering matches torch.
        xc = x.transpose(0, 3, 1, 2).astype(self.dtype)
        t, hw = _unfold(xc, 7, 4, 2)  # (B, L1, 3*49)
        t = TokenTransformer(self.token_dim, dtype=self.dtype, name="attention1")(
            t, deterministic
        )
        b = t.shape[0]
        t = t.transpose(0, 2, 1).reshape(b, self.token_dim, *hw)
        t, hw = _unfold(t, 3, 2, 1)  # (B, L2, 64*9)
        t = TokenTransformer(self.token_dim, dtype=self.dtype, name="attention2")(
            t, deterministic
        )
        t = t.transpose(0, 2, 1).reshape(b, self.token_dim, *hw)
        t, _ = _unfold(t, 3, 2, 1)  # (B, L3, 64*9)
        return nn.Dense(
            self.embed_dim, kernel_init=torch_linear_kernel_init,
            dtype=self.dtype, param_dtype=jnp.float32, name="project",
        )(t)


# (embed_dim, depth, num_heads) per factory name; qk_scale embed**-0.5 only
# applies when loading pretrained weights (t2t.py:348-349) — not wired here.
T2T_CONFIGS = {
    "t2t_vit_t_14": (384, 14, 6),
    "t2t_vit_t_24": (512, 24, 8),
}


class T2TViT(nn.Module):
    """T2T-ViT trunk (t2t.py:115-247); same call contract as ImageNetViT:
    NHWC input -> (B, N+1, C) tokens after the final LayerNorm."""

    img_size: Tuple[int, int] = (256, 128)
    embed_dim: int = 384
    depth: int = 14
    num_heads: int = 6
    mlp_ratio: float = 3.0
    qkv_bias: bool = False
    qk_scale: Optional[float] = None
    token_dim: int = 64
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
        # Three soft splits with strides 4, 2, 2 (t2t.py:89-90).
        return self.img_size[0] // 16, self.img_size[1] // 16

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # (B, H, W, 3)
        camera_id: Optional[jnp.ndarray] = None,
        view_id: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        b = x.shape[0]
        tokens = T2TModule(
            embed_dim=self.embed_dim, token_dim=self.token_dim,
            dtype=self.dtype, name="tokens_to_token",
        )(x, deterministic)
        n = tokens.shape[1]

        cls_token = self.param(
            "cls_token", nn.initializers.normal(0.02), (1, 1, self.embed_dim),
            jnp.float32,
        )
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls_token.astype(tokens.dtype), (b, 1, self.embed_dim)),
             tokens],
            axis=1,
        )
        pos = jnp.asarray(sinusoid_encoding(n + 1, self.embed_dim))  # fixed
        tokens = tokens + pos.astype(tokens.dtype)

        # SIE added to ALL tokens (t2t.py:195-203), like the ImageNet ViT.
        if self.camera > 1 and self.view > 1:
            sie = self.param(
                "sie_embed", nn.initializers.normal(0.02),
                (self.camera * self.view, 1, self.embed_dim), jnp.float32,
            )
            tokens = tokens + self.sie_xishu * sie[
                camera_id * self.view + view_id
            ].astype(tokens.dtype)
        elif self.camera > 1:
            sie = self.param(
                "sie_embed", nn.initializers.normal(0.02),
                (self.camera, 1, self.embed_dim), jnp.float32,
            )
            tokens = tokens + self.sie_xishu * sie[camera_id].astype(tokens.dtype)
        elif self.view > 1:
            sie = self.param(
                "sie_embed", nn.initializers.normal(0.02),
                (self.view, 1, self.embed_dim), jnp.float32,
            )
            tokens = tokens + self.sie_xishu * sie[view_id].astype(tokens.dtype)

        if self.drop_rate > 0.0 and not deterministic:
            tokens = nn.Dropout(self.drop_rate)(tokens, deterministic=False)

        # Main body: the standard timm Block stack (transformer_block.py:59-76
        # == vit_pytorch's Block), linear stochastic-depth decay (t2t.py:156).
        dpr = [
            self.drop_path_rate * i / max(self.depth - 1, 1)
            for i in range(self.depth)
        ]
        # deterministic (arg 2; arg 0 is the module) is Python control flow
        # in the block — static under remat.
        block_cls = (
            nn.remat(ViTBlock, static_argnums=(2,)) if self.remat else ViTBlock
        )
        for i in range(self.depth):
            tokens = block_cls(
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
            )(tokens, deterministic)
        return LayerNorm(epsilon=1e-6, name="norm")(tokens)
