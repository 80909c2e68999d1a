"""DGAF: Dual-Gated Adaptive Fusion family (V1/V3/V4/V3Multi).

Reference: modeling/dual_gated_fusion.py
  * IEG entropy gate (:34-116) — H(|h| normalized), score = proj(h).mean() *
    exp(-H/tau), softmax over modalities;
  * MIG importance gate (:119-182 / per-version gate nets);
  * alpha-blended fusion, sigmoid-constrained learnable alpha (:235-238);
  * V1 `DualGatedPostFusion` (:406-555): (B, C) inputs, output (B, 3C);
  * V3 (:558-745): built-in attention pooling with learnable per-modality
    query + SHARED MultiheadAttention, then dual gating;
  * V4 (:748-902): returns 3 independent enhanced features (DeMo_Parallel);
  * V3Multi (:905-1098): N-modality generalization (FRCA bridge).

TPU-first notes: the per-modality attention pooling of V3/V3Multi runs as one
batched MHA call over a (M*B, K, C) stack; entropy/log/softmax run in fp32.
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import MultiHeadAttention
from ..ops.linear import TorchLinear, torch_linear_kernel_init
from ..ops.norm import LayerNorm


def compute_entropy(feat: jnp.ndarray) -> jnp.ndarray:
    """Feature entropy H(|h|/sum|h|) in fp32 (reference: :55-73)."""
    f = jnp.abs(feat.astype(jnp.float32)) + 1e-8
    p = f / jnp.sum(f, axis=-1, keepdims=True)
    return -jnp.sum(p * jnp.log(p + 1e-8), axis=-1)


class _DualGateCore(nn.Module):
    """IEG + MIG + alpha fusion over stacked (M, B, C) features."""

    feat_dim: int
    tau: float = 1.0
    init_alpha: float = 0.5
    hidden_dim: int = 0  # 0 -> feat_dim
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, h: jnp.ndarray) -> jnp.ndarray:  # h: (M, B, C) -> (B, C)
        m = h.shape[0]
        hidden = self.hidden_dim or self.feat_dim
        f32 = jnp.float32

        # IEG
        ent = compute_entropy(h)  # (M, B)
        z = TorchLinear(self.feat_dim, dtype=self.dtype, name="entropy_proj")(h)
        z = jnp.mean(z.astype(f32), axis=-1)  # (M, B)
        score = z * jnp.exp(-ent / self.tau)
        w = jax.nn.softmax(score, axis=0)  # (M, B)
        h_entropy = jnp.sum(w[..., None] * h.astype(f32), axis=0)  # (B, C)

        # MIG
        hcat = jnp.concatenate([h[i] for i in range(m)], axis=-1)  # (B, M*C)
        g = TorchLinear(hidden, dtype=self.dtype, name="gate_fc0")(hcat)
        g = LayerNorm(name="gate_ln")(g)
        g = jax.nn.relu(g)
        g = TorchLinear(m, dtype=self.dtype, name="gate_fc1")(g)
        gates = jax.nn.sigmoid(g.astype(f32))  # (B, M)
        h_importance = jnp.sum(gates.T[..., None] * h.astype(f32), axis=0)

        alpha_raw = self.param(
            "alpha", lambda k: jnp.asarray(self.init_alpha, f32)
        )
        alpha = jax.nn.sigmoid(alpha_raw)
        return alpha * h_entropy + (1.0 - alpha) * h_importance  # (B, C) fp32


class _Enhance(nn.Module):
    """modal_enhance: Linear + LayerNorm (reference: :466-469)."""

    feat_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = TorchLinear(self.feat_dim, dtype=self.dtype, name="fc")(x)
        return LayerNorm(name="ln")(x)


class DualGatedPostFusion(nn.Module):
    """DGAF V1 (reference: :406-555): (M=3)x(B, C) -> (B, 3C)."""

    feat_dim: int
    tau: float = 1.0
    init_alpha: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, h: jnp.ndarray) -> jnp.ndarray:  # (3, B, C)
        fused = _DualGateCore(
            self.feat_dim, self.tau, self.init_alpha, dtype=self.dtype, name="core"
        )(h)
        enh = _Enhance(self.feat_dim, dtype=self.dtype, name="modal_enhance")(
            fused.astype(h.dtype)
        )
        out = h + enh[None].astype(h.dtype)
        return jnp.concatenate([out[0], out[1], out[2]], axis=-1)


class AttentionPool(nn.Module):
    """Learnable-query attention pooling, shared MHA across modalities.

    Reference: dual_gated_fusion.py:602-615,651-669 — one
    nn.MultiheadAttention shared by all modalities, independent queries.
    Batched here: (M, B, K, C) -> (M, B, C) in ONE attention call.
    """

    feat_dim: int
    num_heads: int = 8
    num_modalities: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:  # (M, B, K, C)
        m, b, k, c = tokens.shape
        queries = self.param(
            "queries",
            nn.initializers.normal(self.feat_dim ** -0.5),
            (self.num_modalities, 1, self.feat_dim),
            jnp.float32,
        )
        q = jnp.broadcast_to(queries[:, None], (m, b, 1, c)).reshape(m * b, 1, c)
        kv = tokens.reshape(m * b, k, c)
        pooled = MultiHeadAttention(
            num_heads=self.num_heads, dtype=self.dtype, name="attn_pool"
        )(q.astype(self.dtype), kv)
        pooled = LayerNorm(name="attn_norm")(pooled[:, 0])
        return pooled.reshape(m, b, c)


class DualGatedAdaptiveFusionV3(nn.Module):
    """DGAF V3 (reference: :558-745): (3)x(B, K, C) tokens -> (B, 3C)."""

    feat_dim: int
    tau: float = 1.0
    init_alpha: float = 0.5
    num_heads: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:  # (3, B, K, C)
        h = AttentionPool(
            self.feat_dim, self.num_heads, tokens.shape[0], dtype=self.dtype, name="pool"
        )(tokens)
        fused = _DualGateCore(
            self.feat_dim, self.tau, self.init_alpha, dtype=self.dtype, name="core"
        )(h)
        enh = _Enhance(self.feat_dim, dtype=self.dtype, name="modal_enhance")(
            fused.astype(tokens.dtype)
        )
        out = h.astype(tokens.dtype) + enh[None]
        return jnp.concatenate([out[0], out[1], out[2]], axis=-1)


class DualGatedAdaptiveFusionV4(nn.Module):
    """DGAF V4 (reference: :748-902): (3)x(B, C) -> 3 independent (B, C)."""

    feat_dim: int
    tau: float = 1.0
    init_alpha: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, h: jnp.ndarray) -> jnp.ndarray:  # (3, B, C) -> (3, B, C)
        fused = _DualGateCore(
            self.feat_dim, self.tau, self.init_alpha, dtype=self.dtype, name="core"
        )(h)
        enh = _Enhance(self.feat_dim, dtype=self.dtype, name="modal_enhance")(
            fused.astype(h.dtype)
        )
        return h + enh[None].astype(h.dtype)


class DualGatedAdaptiveFusionV2(nn.Module):
    """DGAF V2 (reference: :290-403): cross-modal-attention enhanced variant.

    Not reachable from make_model in the reference fork (SURVEY §2.5), kept
    for API completeness.  Unlike V1/V3/V4 it composes the BASE-class gates
    (dual_gated_fusion.py:34-182): the MIG is gate -> scale -> concat ->
    fusion_proj(Linear+LN+ReLU), not a gated weighted sum.  Global features
    are then refined by attending the fused feature over each modality's
    tokens with ONE shared MHA, and enhanced by the projected fused feature;
    returns stacked (3, B, C) enhanced features.
    """

    feat_dim: int
    tau: float = 1.0
    init_alpha: float = 0.5
    use_cross_modal_attn: bool = True
    num_heads: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        h: jnp.ndarray,  # (3, B, C) global features
        tokens: Optional[jnp.ndarray] = None,  # (3, B, N, C) patch tokens
        deterministic: bool = True,
    ) -> jnp.ndarray:
        m = h.shape[0]
        f32 = jnp.float32

        # IEG (InformationEntropyGate, reference :34-116).
        ent = compute_entropy(h)  # (M, B)
        z = TorchLinear(self.feat_dim, dtype=self.dtype, name="entropy_proj")(h)
        score = jnp.mean(z.astype(f32), axis=-1) * jnp.exp(-ent / self.tau)
        w = jax.nn.softmax(score, axis=0)
        h_entropy = jnp.sum(w[..., None] * h.astype(f32), axis=0)  # (B, C)

        # MIG (ModalityImportanceGate, reference :119-182).
        hcat = jnp.concatenate([h[i] for i in range(m)], axis=-1)  # (B, 3C)
        g = TorchLinear(self.feat_dim, dtype=self.dtype, name="gate_fc0")(hcat)
        g = jax.nn.relu(g)
        g = TorchLinear(m, dtype=self.dtype, name="gate_fc1")(g)
        gates = jax.nn.sigmoid(g.astype(f32))  # (B, M)
        gated = jnp.concatenate(
            [gates[:, i : i + 1] * h[i].astype(f32) for i in range(m)], axis=-1
        )
        fp = TorchLinear(self.feat_dim, dtype=self.dtype, name="fusion_fc")(
            gated.astype(h.dtype)
        )
        fp = LayerNorm(name="fusion_ln")(fp)
        h_importance = jax.nn.relu(fp).astype(f32)

        alpha_raw = self.param("alpha", lambda k: jnp.asarray(self.init_alpha, f32))
        alpha = jax.nn.sigmoid(alpha_raw)
        fused = alpha * h_entropy + (1.0 - alpha) * h_importance  # (B, C)

        if self.use_cross_modal_attn and tokens is not None:
            m, b, n, c = tokens.shape
            q = jnp.broadcast_to(
                fused.astype(tokens.dtype)[None, :, None, :], (m, b, 1, c)
            ).reshape(m * b, 1, c)
            kv = tokens.reshape(m * b, n, c)
            attn_out = MultiHeadAttention(
                num_heads=self.num_heads, dtype=self.dtype, name="cross_attn"
            )(q, kv, deterministic=deterministic)[:, 0]
            attn_out = LayerNorm(name="cross_attn_norm")(attn_out)
            h = h + attn_out.reshape(m, b, c).astype(h.dtype)
        proj = TorchLinear(self.feat_dim, dtype=self.dtype, name="output_fc")(
            fused.astype(h.dtype)
        )
        proj = LayerNorm(name="output_ln")(proj)
        proj = jax.nn.gelu(proj, approximate=False)
        return h + proj[None].astype(h.dtype)


class DualGatedAdaptiveFusionV3Multi(nn.Module):
    """DGAF V3Multi (reference: :905-1098): N x (B, K, C) -> (B, N*C)."""

    feat_dim: int
    num_modalities: int = 6
    tau: float = 1.0
    init_alpha: float = 0.5
    num_heads: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:  # (N, B, K, C)
        h = AttentionPool(
            self.feat_dim,
            self.num_heads,
            self.num_modalities,
            dtype=self.dtype,
            name="pool",
        )(tokens)
        fused = _DualGateCore(
            self.feat_dim, self.tau, self.init_alpha, dtype=self.dtype, name="core"
        )(h)
        enh = _Enhance(self.feat_dim, dtype=self.dtype, name="modal_enhance")(
            fused.astype(tokens.dtype)
        )
        out = h.astype(tokens.dtype) + enh[None]
        return jnp.concatenate([out[i] for i in range(self.num_modalities)], axis=-1)
