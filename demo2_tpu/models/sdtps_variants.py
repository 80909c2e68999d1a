"""SDTPS "complete"/"fixed" variant, TPU-native.

Reference: modeling/sdtps_complete.py and modeling/sdtps_fixed.py — the two
files are BYTE-IDENTICAL (verified by diff), so one implementation covers
both registry names.  Neither is imported by any reference entry point
(SURVEY §2.5: the active path is sdtps.py); they are ported so the full
SDTPS design space is available, selected via ``MODEL.SDTPS_VARIANT``.

Differences vs the active `models/sdtps.py`:
  * CrossModalAttention is MULTI-head (sdtps_complete.py:19-196): per-head
    softmax over patches, then a per-head cosine gate
    sigmoid(cos * scale_h + bias_h) multiplied INTO the attention weights,
    then mean over heads — vs the active variant's single-head
    softmax(QK/sqrt(d) + cos/tau).
  * Scores are min-max normalized per token row (:258-266) — vs z-score +
    sigmoid — and averaged equally (:269) — no sample-adaptive MLP weights.
  * Masking is HARD top-k (K = ceil(N * sparse_ratio), :273-283) with an
    optional Gumbel-SOFTMAX straight-through estimator (:277-281) — vs the
    active variant's quantile-threshold sigmoid soft mask.

TPU-first redesign (same scheme as models/sdtps.py): all 9 (modality,
guide) scorers run as ONE set of stacked einsums with leading (3, 3)
parameter axes; the head axis rides along as another batched einsum dim.
Output stays shape-preserving (mask-zeroing, sdtps_complete.py:286-289), so
the variant drops into every DeMo branch unchanged.
"""

from __future__ import annotations

import math
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.linear import xavier_uniform_init
from .sdtps import GUIDE_ORDER, _l2_normalize


class SDTPSComplete(nn.Module):
    embed_dim: int = 512
    num_heads: int = 4
    sparse_ratio: float = 0.6
    use_gumbel: bool = False
    gumbel_tau: float = 1.0
    use_cross_attn: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        patches: jnp.ndarray,  # (3, B, N, C)
        globals_: jnp.ndarray,  # (3, B, C)
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        m, b, n, c = patches.shape
        h = self.num_heads
        d = c // h
        f32 = jnp.float32

        # ---- cosine similarities for all 9 (modality, guide) pairs --------
        pn = _l2_normalize(patches.astype(f32))
        gn = _l2_normalize(globals_.astype(f32))
        cos = jnp.einsum("mbnc,gbc->mgbn", pn, gn)  # (3, 3, B, N)

        if self.use_cross_attn:
            cd = self.dtype
            wq = self.param("q_proj_kernel", xavier_uniform_init, (m, m, c, c), f32)
            bq = self.param("q_proj_bias", nn.initializers.zeros, (m, m, c), f32)
            wk = self.param("k_proj_kernel", xavier_uniform_init, (m, m, c, c), f32)
            bk = self.param("k_proj_bias", nn.initializers.zeros, (m, m, c), f32)
            # Per-head cosine gate affine, init scale=bias=0.5 so the initial
            # gate sits in sigmoid([0.62, 0.73]) (sdtps_complete.py:100-113).
            gscale = self.param(
                "gate_scale", nn.initializers.constant(0.5), (m, m, h), f32
            )
            gbias = self.param(
                "gate_bias", nn.initializers.constant(0.5), (m, m, h), f32
            )

            # q[m,g] projects guide g's global; k[m,g] modality m's patches;
            # head split is a reshape of the projected channel axis.
            q = (
                jnp.einsum("gbc,mgcd->mgbd", globals_.astype(cd), wq.astype(cd))
                + bq.astype(cd)[:, :, None, :]
            ).reshape(m, m, b, h, d)
            k = (
                jnp.einsum("mbnc,mgcd->mgbnd", patches.astype(cd), wk.astype(cd))
                + bk.astype(cd)[:, :, None, None, :]
            ).reshape(m, m, b, n, h, d)
            logits = jnp.einsum(
                "mgbhd,mgbnhd->mgbhn", q, k, preferred_element_type=f32
            ) * (d**-0.5)
            attn = jax.nn.softmax(logits, axis=-1)  # (3, 3, B, H, N)
            gate = jax.nn.sigmoid(
                cos[:, :, :, None, :] * gscale[:, :, None, :, None]
                + gbias[:, :, None, :, None]
            )
            scores = jnp.mean(attn * gate, axis=3)  # (3, 3, B, N)
        else:
            scores = cos

        # ---- per-modality (self, m2, m3) combine --------------------------
        guide_idx = jnp.asarray(GUIDE_ORDER)
        ordered = jnp.take_along_axis(scores, guide_idx[:, :, None, None], axis=1)
        smin = jnp.min(ordered, axis=-1, keepdims=True)
        smax = jnp.max(ordered, axis=-1, keepdims=True)
        s_norm = (ordered - smin) / (smax - smin + 1e-8)  # min-max (:258-266)
        score = jnp.mean(s_norm, axis=1)  # (3, B, N)

        # ---- hard top-k mask (K = ceil(N * rho), :273-283) ----------------
        num_keep = max(1, math.ceil(n * self.sparse_ratio))
        order = jnp.argsort(-score, axis=-1)
        ranks = jnp.argsort(order, axis=-1)
        hard = (ranks < num_keep).astype(f32)
        if self.use_gumbel and not deterministic:
            u = jax.random.uniform(self.make_rng("gumbel"), score.shape)
            gnoise = -jnp.log(-jnp.log(u + 1e-9) + 1e-9)
            soft = jax.nn.softmax((score + gnoise) / self.gumbel_tau, axis=-1)
            mask = hard + (soft - jax.lax.stop_gradient(soft))  # STE (:277-281)
        else:
            mask = hard

        enhanced = patches * mask[..., None].astype(patches.dtype)
        return enhanced, mask
