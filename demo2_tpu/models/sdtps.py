"""SDTPS: Sparse & Dense Token-aware Patch Selection, TPU-native.

Reference: modeling/sdtps.py (CrossModalAttention :19-108, TokenSparse
:111-279, MultiModalSDTPS :282-538).

TPU-first redesign: the reference runs 9 independent single-head
cross-attention scorers (3 modalities x {self, cross-m2, cross-m3}) plus 9
cosine-similarity passes sequentially.  Here all 9 (modality, guide) pairs are
computed by ONE set of stacked einsums over parameter tensors with leading
(3, 3) axes — a single fused score computation on the MXU.  The quantile
threshold + sigmoid soft mask is shape-preserving (no dynamic shapes under
jit).  Gumbel sampling uses `jax.random` through flax's rng plumbing.

Weight sharing (`share_cross_attn_weights`, reference: sdtps.py:342-365)
is expressed as a (3, 1, ...) parameter broadcast instead of module aliasing.
"""

from __future__ import annotations

import math
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.linear import torch_linear_kernel_init, xavier_uniform_init
from ..ops.norm import LayerNorm

# Per-modality guide order (self, m2, m3); reference: sdtps.py:453-523.
#   RGB scores against (RGB, NIR, TIR); NIR against (NIR, RGB, TIR);
#   TIR against (TIR, RGB, NIR).
GUIDE_ORDER = ((0, 1, 2), (1, 0, 2), (2, 0, 1))


def _l2_normalize(x, axis=-1, eps=1e-12):
    # Matches F.normalize exactly: sqrt(max(||x||^2, eps^2)) == max(||x||, eps),
    # but keeps the backward finite at x == 0 (norm's d||x||/dx = x/||x|| is
    # 0/0 there; the max-before-sqrt form routes the zero-vector case through
    # the clamp branch, whose gradient is 0).  Exactly-zero vectors are
    # reachable: missing-modality masks zero whole token sets.
    n2 = jnp.sum(jnp.square(x), axis=axis, keepdims=True)
    return x / jnp.sqrt(jnp.maximum(n2, eps * eps))


class ModalWeightMLP(nn.Module):
    """Sample-adaptive modality-weight MLP (reference: sdtps.py:163-178)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, g, deterministic: bool = True):  # g: (B, 3C)
        xavier_half = nn.initializers.variance_scaling(0.25, "fan_avg", "uniform")
        x = nn.Dense(256, kernel_init=xavier_half, dtype=self.dtype,
                     param_dtype=jnp.float32, name="fc0")(g)
        x = LayerNorm(name="ln")(x)
        x = jax.nn.gelu(x, approximate=False)
        x = nn.Dropout(0.1)(x, deterministic=deterministic)
        x = nn.Dense(64, kernel_init=xavier_half, dtype=self.dtype,
                     param_dtype=jnp.float32, name="fc1")(x)
        x = jax.nn.gelu(x, approximate=False)
        # Final layer zero-init so initial weights are uniform (sdtps.py:177-178).
        x = nn.Dense(3, kernel_init=nn.initializers.zeros, dtype=self.dtype,
                     param_dtype=jnp.float32, name="fc2")(x)
        return x  # (B, 3) logits


class MultiModalSDTPS(nn.Module):
    embed_dim: int = 512
    sparse_ratio: float = 0.5
    use_gumbel: bool = False
    gumbel_tau: float = 1.0
    use_cross_attn: bool = True  # cross_attn_type == 'attention'
    share_cross_attn_weights: bool = False
    cosine_tau: float = 0.3
    use_adaptive_weights: bool = True
    use_soft_masking: bool = True
    soft_mask_tau: float = 0.3
    dtype: Any = jnp.float32

    def _normalize_score(self, s):
        """Z-score + sigmoid over tokens (reference: sdtps.py:182-200).

        torch .std() is the unbiased estimator — matched here.  The tiny eps
        INSIDE the sqrt bounds d(sqrt)/d(var) = 0.5/sqrt(var + eps): with few
        tokens (small N) the score variance can underflow to exactly 0 — XLA's
        fused reduction hits 0 where the op-by-op path keeps a denormal — and
        the unguarded sqrt backward then emits inf -> NaN grads that poison
        the whole backbone (observed at N=2 in the e2e reference cross-check).
        Forward shift is <=1e-10 in std units, far inside parity tolerance.
        """
        n = s.shape[-1]
        mean = jnp.mean(s, axis=-1, keepdims=True)
        var = jnp.sum(jnp.square(s - mean), axis=-1, keepdims=True) / max(n - 1, 1)
        z = (s - mean) / (jnp.sqrt(var + 1e-20) + 1e-5)
        return jax.nn.sigmoid(z)

    @nn.compact
    def __call__(
        self,
        patches: jnp.ndarray,  # (3, B, N, C)
        globals_: jnp.ndarray,  # (3, B, C)
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        m, b, n, c = patches.shape
        f32 = jnp.float32

        # ---- cosine similarities for all 9 (modality, guide) pairs --------
        pn = _l2_normalize(patches.astype(f32))
        gn = _l2_normalize(globals_.astype(f32))
        cos = jnp.einsum("mbnc,gbc->mgbn", pn, gn)  # (3, 3, B, N)

        # ---- stacked cross-attention scores -------------------------------
        if self.use_cross_attn:
            cd = self.dtype  # projections on the MXU in compute dtype;
            # logits/softmax stay fp32 (the AMP-parity precision split).
            wshape = (m, 1) if self.share_cross_attn_weights else (m, m)
            wq = self.param("q_proj_kernel", xavier_uniform_init, (*wshape, c, c), f32)
            bq = self.param("q_proj_bias", nn.initializers.zeros, (*wshape, c), f32)
            wk = self.param("k_proj_kernel", xavier_uniform_init, (*wshape, c, c), f32)
            bk = self.param("k_proj_bias", nn.initializers.zeros, (*wshape, c), f32)
            if self.share_cross_attn_weights:
                wq, bq = (jnp.broadcast_to(t, (m, m) + t.shape[2:]) for t in (wq, bq))
                wk, bk = (jnp.broadcast_to(t, (m, m) + t.shape[2:]) for t in (wk, bk))
            # q[m,g] projects guide g's global; k[m,g] projects modality m's patches.
            q = jnp.einsum(
                "gbc,mgcd->mgbd", globals_.astype(cd), wq.astype(cd)
            ) + bq.astype(cd)[:, :, None, :]
            k = jnp.einsum(
                "mbnc,mgcd->mgbnd", patches.astype(cd), wk.astype(cd)
            ) + bk.astype(cd)[:, :, None, None, :]
            logits = jnp.einsum(
                "mgbd,mgbnd->mgbn", q, k, preferred_element_type=f32
            ) * (c ** -0.5)
            logits = logits + cos / self.cosine_tau
            scores = jax.nn.softmax(logits, axis=-1)  # (3, 3, B, N)
        else:
            scores = cos

        # ---- combine per-modality (self, m2, m3) scores -------------------
        guide_idx = jnp.asarray(GUIDE_ORDER)  # (3, 3)
        # ordered[m, j] = scores[m, GUIDE_ORDER[m][j]]
        ordered = jnp.take_along_axis(scores, guide_idx[:, :, None, None], axis=1)
        s_norm = self._normalize_score(ordered)  # (3, 3, B, N)

        if self.use_adaptive_weights:
            gcat = jnp.concatenate([globals_[0], globals_[1], globals_[2]], axis=-1)
            weights = jnp.stack(
                [
                    jax.nn.softmax(
                        ModalWeightMLP(dtype=self.dtype, name=f"modal_weight_mlp_{i}")(
                            gcat, deterministic
                        ).astype(f32),
                        axis=-1,
                    )
                    for i in range(m)
                ]
            )  # (3, B, 3)
            score = jnp.einsum("mjbn,mbj->mbn", s_norm, weights)
        else:
            score = jnp.mean(s_norm, axis=1)

        # ---- masking (reference: sdtps.py:241-279) ------------------------
        if self.use_soft_masking:
            thr = jnp.quantile(score, 1.0 - self.sparse_ratio, axis=-1, keepdims=True)
            mask = jax.nn.sigmoid((score - thr) / self.soft_mask_tau)
        else:
            num_keep = max(1, math.ceil(n * self.sparse_ratio))
            order = jnp.argsort(-score, axis=-1)  # descending
            ranks = jnp.argsort(order, axis=-1)
            hard = (ranks < num_keep).astype(f32)
            if self.use_gumbel and not deterministic:
                u = jax.random.uniform(self.make_rng("gumbel"), score.shape)
                gnoise = -jnp.log(-jnp.log(u + 1e-9) + 1e-9)
                soft = jax.nn.sigmoid((score + gnoise - 0.5) / self.gumbel_tau)
                # Straight-through: forward hard, backward soft.
                mask = hard + (soft - jax.lax.stop_gradient(soft))
            else:
                mask = hard

        enhanced = patches * mask[..., None].astype(patches.dtype)
        return enhanced, mask
