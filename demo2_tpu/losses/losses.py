"""Training losses: label-smoothed ID loss, batch-hard triplet, center loss.

Reference: layers/make_loss.py:13-80 (factory), layers/triplet_loss.py
(euclidean distmat + batch-hard mining :51-105, soft-margin default when
MODEL.NO_MARGIN, :107-135), layers/softmax_loss.py:4-34 (eps=0.1 label
smoothing), layers/center_loss.py (always built with feat_dim=2048,
make_loss.py:15-16; dormant unless 'center' in METRIC_LOSS_TYPE).

All reductions run in fp32.  The batch-hard mining uses masked max/min
instead of boolean indexing (shape-stable under jit): with the PK sampler's
guarantee that every anchor has >=1 positive and >=1 negative, the masked
forms are exactly equivalent to the reference's `dist_mat[is_pos].view(N,-1)`
trick (triplet_loss.py:78-84).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config.defaults import Config


def softmax_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    return jnp.mean(nll)


def cross_entropy_label_smooth(
    logits: jnp.ndarray, labels: jnp.ndarray, epsilon: float = 0.1
) -> jnp.ndarray:
    """CrossEntropyLabelSmooth (reference: softmax_loss.py:4-34)."""
    logits = logits.astype(jnp.float32)
    num_classes = logits.shape[-1]
    logp = jax.nn.log_softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    targets = (1.0 - epsilon) * onehot + epsilon / num_classes
    return jnp.mean(jnp.sum(-targets * logp, axis=-1))


def euclidean_dist(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Clamped-sqrt pairwise euclidean distance (triplet_loss.py:16-31).

    Delegates to metric_learning's batched form — one definition of the
    clamp/sqrt numerics package-wide (metrics.euclidean_distance is the
    deliberate squared variant: ranking only needs monotonicity).
    """
    from .metric_learning import _pairwise_dist

    return _pairwise_dist(x.astype(jnp.float32), y.astype(jnp.float32))


def batch_hard_triplet_loss(
    feat: jnp.ndarray,
    labels: jnp.ndarray,
    margin: Optional[float] = None,
    normalize_feature: bool = False,
) -> jnp.ndarray:
    """Batch-hard triplet; soft-margin (softplus) when margin is None.

    Reference: triplet_loss.py:51-135.  Soft margin:
    SoftMarginLoss(dist_an - dist_ap, 1) = mean(log(1 + exp(-(an - ap)))).
    """
    if normalize_feature:
        # max-before-sqrt keeps the backward finite at feat == 0 (norm's
        # x/||x|| cotangent is 0/0 there); forward is unchanged.
        n2 = jnp.sum(jnp.square(feat), axis=-1, keepdims=True)
        feat = feat / (jnp.sqrt(jnp.maximum(n2, 1e-60)) + 1e-12)
    dist = euclidean_dist(feat, feat)
    same = labels[:, None] == labels[None, :]
    neg_inf = jnp.float32(-1e30)
    pos_inf = jnp.float32(1e30)
    dist_ap = jnp.max(jnp.where(same, dist, neg_inf), axis=1)
    dist_an = jnp.min(jnp.where(same, pos_inf, dist), axis=1)
    if margin is not None:
        # MarginRankingLoss(dist_an, dist_ap, 1): mean(relu(ap - an + margin)).
        return jnp.mean(jax.nn.relu(dist_ap - dist_an + margin))
    return jnp.mean(jax.nn.softplus(-(dist_an - dist_ap)))


@dataclasses.dataclass
class CenterLossState:
    """Learnable class centers (reference: layers/center_loss.py:7)."""

    centers: jnp.ndarray  # (num_classes, feat_dim)

    @staticmethod
    def create(rng, num_classes: int, feat_dim: int = 2048) -> "CenterLossState":
        return CenterLossState(jax.random.normal(rng, (num_classes, feat_dim)))


def center_loss(centers: jnp.ndarray, feat: jnp.ndarray, labels: jnp.ndarray):
    """Sum of clamped squared distances to class centers / batch."""
    c = centers[labels].astype(jnp.float32)
    d = jnp.sum(jnp.square(feat.astype(jnp.float32) - c), axis=-1)
    return jnp.mean(jnp.clip(d, 1e-12, 1e12))


def make_loss_fn(cfg: Config, num_classes: int) -> Callable:
    """Per-branch loss closure (reference: make_loss.py:14,32-72).

    DATALOADER.SAMPLER selects the recipe exactly as the reference does:
    'softmax' -> plain cross-entropy only (no label smooth, no triplet —
    batch-hard mining is meaningless without PK batches); 'softmax_triplet'
    (default) -> ID_W * xent + TRI_W * triplet.
    """
    sampler = getattr(cfg.DATALOADER, "SAMPLER", "softmax_triplet")
    if sampler == "softmax":

        def ce_only(logits, feat, target):
            return softmax_cross_entropy(logits, target)

        return ce_only
    if sampler != "softmax_triplet":
        raise ValueError(
            f"DATALOADER.SAMPLER must be softmax|softmax_triplet, got "
            f"{sampler!r} (the reference accepts the same two working "
            "values, make_loss.py:78-80)"
        )
    use_smooth = cfg.MODEL.IF_LABELSMOOTH == "on"
    margin = None if cfg.MODEL.NO_MARGIN else cfg.SOLVER.MARGIN
    id_w = cfg.MODEL.ID_LOSS_WEIGHT
    tri_w = cfg.MODEL.TRIPLET_LOSS_WEIGHT

    def loss_fn(logits, feat, target):
        if use_smooth:
            id_loss = cross_entropy_label_smooth(logits, target)
        else:
            id_loss = softmax_cross_entropy(logits, target)
        tri_loss = batch_hard_triplet_loss(feat, target, margin=margin)
        return id_w * id_loss + tri_w * tri_loss

    return loss_fn


def branch_weights(cfg: Config, branch_names) -> Dict[str, float]:
    """Branch weighting.

    DeMo/DeMoLegacy mirror the reference engine exactly: the FIRST
    (score, feat) pair is multiplied by SDTPS_LOSS_WEIGHT whenever
    USE_SDTPS is set (engine/processor.py:86-87, 95-96) — note this also
    applies to the dgaf pair in the SDTPS+DGAF config, an intentional
    parity quirk.

    DeMo_Parallel uses the weights its config documents
    (SDTPS/DGAF/FUSED_LOSS_WEIGHT per branch family,
    config/defaults.py:48,63,69) — the reference engine defines but never
    applies them (its generic loop only weights pair 0); this is a
    documented intent-over-quirk deviation.  Setting
    MODEL.PARALLEL_LOSS_PARITY reproduces the reference engine exactly:
    only the first pair (sdtps_rgb, the reference's output[0:2],
    make_model.py:1189-1190) is scaled by SDTPS_LOSS_WEIGHT
    (engine/processor.py:86-96).
    """
    names = list(branch_names)
    if cfg.MODEL.ARCH == "DeMo_Parallel":
        if cfg.MODEL.PARALLEL_LOSS_PARITY:
            w = {n: 1.0 for n in names}
            if cfg.MODEL.USE_SDTPS and "sdtps_rgb" in w:
                w["sdtps_rgb"] = cfg.MODEL.SDTPS_LOSS_WEIGHT
            return w
        fam = {
            "sdtps": cfg.MODEL.SDTPS_LOSS_WEIGHT,
            "dgaf": cfg.MODEL.DGAF_LOSS_WEIGHT,
            "fused": cfg.MODEL.FUSED_LOSS_WEIGHT,
        }
        return {n: fam.get(n.split("_")[0], 1.0) for n in names}
    w = {n: 1.0 for n in names}
    if cfg.MODEL.USE_SDTPS and names:
        w[names[0]] = cfg.MODEL.SDTPS_LOSS_WEIGHT
    return w
