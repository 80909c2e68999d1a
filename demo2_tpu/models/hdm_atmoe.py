"""HDM (Hierarchical Decoupling Module) + ATMoE (Attention-Triggered MoE).

Reference: modeling/moe/AttnMOE.py — HDM builds 7 decoupled features by
cross-attending 7 learnable query tokens over the token subsets {R}, {N},
{T}, {RN}, {RT}, {NT}, {RNT} with 7 independent nn.MultiheadAttention
modules (:135-191); ATMoE (`MoM`) gates 7 dense experts per head-chunk with
an attention gate (:50-121).  NOTE: this call path is orphaned in the
reference fork (constructed at make_model.py:131-138 but never invoked by
any forward); here it is wired as a first-class branch, restoring the
original-paper semantics.

TPU-first redesign (docs/PERF.md has the measurement ladder, 5.6 -> 2.3 ms):
  * k is NEVER materialized: each set's query is a constant learned vector,
    so q^T (W_k x + b_k) == (W_k^T q)^T x + q^T b_k — the per-set key
    projections fold into ONE thin (C, 4h) GEMM per modality (a modality
    belongs to exactly 4 of the 7 sets), skipping the 26 GFLOP k GEMM and
    ~200 MB of k HBM traffic;
  * v is projected modality-major — one (C, 4C) GEMM per modality, zero
    input duplication — and consumed strictly in its produced layout
    (broadcast multiply + token reduction for the PV product; the earlier
    set-major dot_general formulation relayouted ~100 MB around a matvec);
  * JOINT softmaxes across each set's member pairs on the SMALL
    (12, B, h, seg) logits tensor reproduce exact subset attention — all
    grouping permutations happen there, never on the big tensors;
  * the per-set projection weights are stacked with a leading (7,) axis and
    applied with single einsums;
  * ATMoE's 7x`head` expert MLPs collapse into one (head, expert, d, d)
    einsum + one flattened BatchNorm — the dense MoE never dispatches, so no
    all-to-all is needed (SURVEY §2.12).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.activations import quick_gelu
from ..ops.linear import TorchLinear, xavier_uniform_init
from ..ops.norm import TorchBatchNorm

NUM_SETS = 7
# Membership of each modality segment (R, N, T) in each of the 7 sets.
SET_MEMBERSHIP = np.array(
    [
        [1, 0, 0],  # R
        [0, 1, 0],  # N
        [0, 0, 1],  # T
        [1, 1, 0],  # RN
        [1, 0, 1],  # RT
        [0, 1, 1],  # NT
        [1, 1, 1],  # RNT
    ],
    dtype=np.float32,
)
# The 12 live (set, member-modality) pairs, grouped by set cardinality so the
# per-cardinality attentions have static shapes.  Order within each set is
# modality order (R, N, T) — the reference concatenates subsets that way.
PAIR_SET = np.array([0, 1, 2, 3, 3, 4, 4, 5, 5, 6, 6, 6])
PAIR_MOD = np.array([0, 1, 2, 0, 1, 0, 2, 1, 2, 0, 1, 2])
CARD_GROUPS = ((0, 3, 1), (3, 9, 2), (9, 12, 3))  # (pair_start, pair_end, card)
# Modality-major view of the same 12 pairs: each modality belongs to exactly
# 4 sets, so its k/v projections for all of them are ONE (C, 4C) GEMM.
MOD_SETS = np.array([[0, 3, 4, 6], [1, 3, 5, 6], [2, 4, 5, 6]])
# Flat modality-major pair order has set ids [0,3,4,6, 1,3,5,6, 2,4,5,6];
# permutation taking it to the set-major PAIR_SET order above (and back).
MM_TO_SET = np.array([0, 4, 8, 1, 5, 2, 9, 6, 10, 3, 7, 11])
SET_TO_MM = np.argsort(MM_TO_SET)
MM_SET_IDS = np.array([0, 3, 4, 6, 1, 3, 5, 6, 2, 4, 5, 6])


class HDM(nn.Module):
    """7-way decoupling via cardinality-grouped batched subset attention."""

    feat_dim: int
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        patches: jnp.ndarray,  # (3, B, N, C)
        globals_: jnp.ndarray,  # (3, B, C)
        deterministic: bool = True,
    ) -> jnp.ndarray:  # (7, B, C)
        m, b, n, c = patches.shape
        h = c // 64  # head_num_attn = feat_dim // 64 (reference: :142)
        d = c // h
        f32 = jnp.float32
        seg = n + 1  # [global; patches] per modality (reference: :163-165)

        # Per-modality token segments (3, B, N+1, C).
        segs = jnp.concatenate([globals_[:, :, None], patches], axis=2).astype(
            self.dtype
        )

        # Two DIFFERENT scales (review round 4 — they coincide only at
        # feat_dim=64 where h=1): token init uses feat_dim**-0.5
        # (AttnMOE.py:134-142 `scale * torch.randn`), attention logits use
        # the PER-HEAD dim**-0.5 (nn.MultiheadAttention internal scaling,
        # head_dim = 64 by construction).
        scale = d ** -0.5
        tokens = self.param(
            "set_tokens", nn.initializers.normal(self.feat_dim ** -0.5),
            (NUM_SETS, c), f32,
        )
        in_proj = self.param(
            "in_proj_kernel", xavier_uniform_init, (NUM_SETS, c, 3 * c), f32
        )
        in_bias = self.param("in_proj_bias", nn.initializers.zeros, (NUM_SETS, 3 * c), f32)
        wq, wk, wv = jnp.split(in_proj.astype(self.dtype), 3, axis=-1)
        bq, bk, bv = jnp.split(in_bias.astype(self.dtype), 3, axis=-1)

        q = jnp.einsum("sc,scd->sd", tokens.astype(self.dtype), wq) + bq  # (7, C)
        q = q.reshape(NUM_SETS, h, d)

        # v in MODALITY-major layout: one (B*seg, C) x (C, 4C) GEMM per
        # modality covers all 4 sets that modality belongs to — no input
        # duplication, and the big (3, B, seg, 4, h, d) tensor is consumed
        # below strictly in its produced layout (the earlier set-major
        # dot_general formulation relayouted ~100 MB around a matvec).
        wv_g = wv[MOD_SETS]  # (3, 4, C, C)
        vv = jnp.einsum("mblc,mjcd->mbljd", segs, wv_g) + bv[MOD_SETS][:, None, None]
        vv = vv.reshape(m, b, seg, 4, h, d)

        # k is NEVER materialized: the query is a constant vector per
        # (set, head), so q^T (W_k x + b_k) == (W_k^T q)^T x + q^T b_k — fold
        # W_k^T q into a single (C, 4h) projection `u` (a param-only einsum)
        # and compute all 12 pairs' logits as one thin GEMM per modality.
        # Skips the 26 GFLOP k GEMM and ~200 MB of k HBM traffic outright.
        wk_hd = wk[MOD_SETS].reshape(m, 4, c, h, d)
        qg = q[MOD_SETS]  # (3, 4, h, d)
        u = jnp.einsum("mjchd,mjhd->mjhc", wk_hd, qg)  # (3, 4, h, C)
        lbias = jnp.einsum(
            "mjhd,mjhd->mjh", bk[MOD_SETS].reshape(m, 4, h, d), qg
        )  # (3, 4, h)
        logits_mm = (
            jnp.einsum("mblc,mjhc->mbljh", segs, u, preferred_element_type=f32)
            + lbias.astype(f32)[:, None, None]
        ) * scale  # (3, B, seg, 4, h)
        lg_flat = logits_mm.transpose(0, 3, 1, 4, 2).reshape(12, b, h, seg)
        lg_sm = lg_flat[MM_TO_SET]  # set-major (12, B, h, seg)

        # JOINT softmax across each set's member pairs — mathematically the
        # softmax over the concatenated subset.
        probs_sm = []
        for p0, p1, card in CARD_GROUPS:
            n_sets = (p1 - p0) // card
            lg = lg_sm[p0:p1].reshape(n_sets, card, b, h, seg)
            mx = jnp.max(lg, axis=(1, 4), keepdims=True)
            e = jnp.exp(lg - mx)
            z = jnp.sum(e, axis=(1, 4), keepdims=True)
            probs = e / z  # (n_sets, card, B, h, seg)
            if self.dropout > 0.0 and not deterministic:
                keep = jax.random.bernoulli(
                    self.make_rng("dropout"), 1.0 - self.dropout, probs.shape
                )
                probs = jnp.where(keep, probs / (1.0 - self.dropout), 0.0)
            probs_sm.append(probs.reshape(p1 - p0, b, h, seg))
        probs_sm = jnp.concatenate(probs_sm, axis=0)  # (12, B, h, seg)

        # PV product: broadcast multiply + token reduction, again in the k/v
        # native layout; per-pair partial sums then segment-sum into sets.
        probs_mm = (
            probs_sm[SET_TO_MM]
            .reshape(3, 4, b, h, seg)
            .transpose(0, 2, 4, 1, 3)  # (3, B, seg, 4, h)
            .astype(self.dtype)
        )
        out_mm = jnp.sum(vv * probs_mm[..., None], axis=2)  # (3, B, 4, h, d)
        out_pairs = out_mm.transpose(0, 2, 1, 3, 4).reshape(12, b, c)
        out = jax.ops.segment_sum(
            out_pairs, jnp.asarray(MM_SET_IDS), num_segments=NUM_SETS
        )  # (7, B, C)

        w_out = self.param("out_proj_kernel", xavier_uniform_init, (NUM_SETS, c, c), f32)
        b_out = self.param("out_proj_bias", nn.initializers.zeros, (NUM_SETS, c), f32)
        out = jnp.einsum("sbc,scd->sbd", out, w_out.astype(self.dtype)) + b_out.astype(
            self.dtype
        )[:, None, :]
        return out  # (7, B, C)


class ATMoE(nn.Module):
    """`MoM` dense attention-gated MoE (reference: AttnMOE.py:85-121)."""

    feat_dim: int
    num_experts: int = 7
    head: int = 12
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        feats: jnp.ndarray,  # (7, B, C) decoupled features
        use_running_average: bool = True,
    ) -> jnp.ndarray:
        s, b, c = feats.shape
        hd = self.head
        d = c // hd
        f32 = jnp.float32

        # ---- attention gate (CrossAttention, reference: :50-68) -----------
        query = jnp.concatenate([feats[i] for i in range(s)], axis=-1)  # (B, 7C)
        x = TorchLinear(c, dtype=self.dtype, name="linear_re_fc")(query)
        x = quick_gelu(x)
        x = TorchBatchNorm(name="linear_re_bn")(x, use_running_average)
        q = TorchLinear(c, use_bias=False, dtype=self.dtype, name="gate_q")(x)
        key = jnp.swapaxes(feats, 0, 1)  # (B, 7, C)
        k = TorchLinear(c, use_bias=False, dtype=self.dtype, name="gate_k")(key)
        qh = q.reshape(b, hd, 1, d)
        kh = k.reshape(b, s, hd, d).transpose(0, 2, 1, 3)  # (B, hd, 7, d)
        attn = jnp.einsum("bhqd,bhsd->bhqs", qh, kh, preferred_element_type=f32)
        gates = jax.nn.softmax(attn.astype(f32) * (d ** -0.5), axis=-1)  # (B, hd, 1, 7)

        # ---- dense experts (ExpertHead/Expert, reference: :24-47) ---------
        # chunk features along C into `head` slices; expert (i of 7) in head h
        # processes chunk h of feature i.
        xs = feats.transpose(1, 0, 2).reshape(b, s, hd, d)  # (B, 7, hd, d)
        w = self.param(
            "expert_kernel",
            nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
            (hd, s, d, d),
            f32,
        )
        bias = self.param("expert_bias", nn.initializers.zeros, (hd, s, d), f32)
        y = jnp.einsum("bshd,hsde->bshe", xs.astype(self.dtype), w.astype(self.dtype))
        y = y + bias.astype(self.dtype)[None].transpose(0, 2, 1, 3)
        y = quick_gelu(y)
        # Per-(expert, head, channel) BatchNorm over the batch == one flat BN.
        y = TorchBatchNorm(name="expert_bn")(
            y.reshape(b, s * hd * d), use_running_average
        ).reshape(b, s, hd, d)
        # gate: (B, hd, 1, 7) -> weight expert s in head h by gates[b, h, 0, s]
        gw = gates[:, :, 0, :].transpose(0, 2, 1)  # (B, 7, hd)
        y = y * gw[..., None].astype(y.dtype)
        # Reference concatenates per-head (B, 7, d) blocks along the last dim
        # then flattens -> feature order (set-major, head, channel).
        return y.reshape(b, s * hd * d)  # (B, 7C)


class GeneralFusion(nn.Module):
    """HDM -> ATMoE orchestration (reference: AttnMOE.py:124-225)."""

    feat_dim: int
    use_hdm: bool = True
    use_atm: bool = True
    num_experts: int = 7
    head: int = 12
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        patches: jnp.ndarray,
        globals_: jnp.ndarray,
        deterministic: bool = True,
        use_running_average: bool = True,
    ) -> jnp.ndarray:
        feats = HDM(self.feat_dim, dropout=self.dropout, dtype=self.dtype, name="hdm")(
            patches, globals_, deterministic
        )
        if self.use_atm:
            return ATMoE(
                self.feat_dim,
                num_experts=self.num_experts,
                head=self.head,
                dtype=self.dtype,
                name="moe",
            )(feats, use_running_average)
        s, b, c = feats.shape
        return feats.transpose(1, 0, 2).reshape(b, s * c)
