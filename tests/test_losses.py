"""Loss parity vs torch formulations."""

import jax.numpy as jnp
import numpy as np
import torch

from demo2_tpu.losses import (
    batch_hard_triplet_loss,
    cross_entropy_label_smooth,
    euclidean_dist,
)


def test_label_smooth_matches_torch_formula():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(8, 5)).astype(np.float32)
    labels = rng.integers(0, 5, 8)
    eps = 0.1
    t = torch.from_numpy(logits)
    logp = torch.nn.functional.log_softmax(t, dim=1)
    onehot = torch.zeros_like(logp).scatter_(1, torch.from_numpy(labels)[:, None], 1)
    targets = (1 - eps) * onehot + eps / 5
    ref = (-targets * logp).sum(1).mean().item()
    out = float(cross_entropy_label_smooth(jnp.asarray(logits), jnp.asarray(labels)))
    np.testing.assert_allclose(out, ref, rtol=1e-5)


def _torch_batch_hard(feat, labels, margin=None):
    """Torch reference for batch-hard soft-margin triplet (triplet_loss.py)."""
    t = torch.from_numpy(feat)
    n = t.shape[0]
    xx = t.pow(2).sum(1, keepdim=True).expand(n, n)
    dist = (xx + xx.t() - 2 * t @ t.t()).clamp(min=1e-12).sqrt()
    labels_t = torch.from_numpy(labels)
    is_pos = labels_t.expand(n, n).eq(labels_t.expand(n, n).t())
    dist_ap = torch.stack([dist[i][is_pos[i]].max() for i in range(n)])
    dist_an = torch.stack([dist[i][~is_pos[i]].min() for i in range(n)])
    y = torch.ones_like(dist_an)
    if margin is not None:
        return torch.nn.functional.margin_ranking_loss(
            dist_an, dist_ap, y, margin=margin
        ).item()
    return torch.nn.functional.soft_margin_loss(dist_an - dist_ap, y).item()


def test_batch_hard_triplet_soft_margin():
    rng = np.random.default_rng(1)
    feat = rng.normal(size=(16, 32)).astype(np.float32)
    labels = np.repeat(np.arange(4), 4)  # PK structure
    ref = _torch_batch_hard(feat, labels)
    out = float(batch_hard_triplet_loss(jnp.asarray(feat), jnp.asarray(labels)))
    np.testing.assert_allclose(out, ref, rtol=1e-4)


def test_batch_hard_triplet_margin():
    rng = np.random.default_rng(2)
    feat = rng.normal(size=(12, 16)).astype(np.float32)
    labels = np.repeat(np.arange(3), 4)
    ref = _torch_batch_hard(feat, labels, margin=0.3)
    out = float(
        batch_hard_triplet_loss(jnp.asarray(feat), jnp.asarray(labels), margin=0.3)
    )
    np.testing.assert_allclose(out, ref, rtol=1e-4)


def test_euclidean_dist_matches_torch():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(6, 8)).astype(np.float32)
    d = np.asarray(euclidean_dist(jnp.asarray(x), jnp.asarray(x)))
    t = torch.from_numpy(x)
    xx = t.pow(2).sum(1, keepdim=True).expand(6, 6)
    ref = (xx + xx.t() - 2 * t @ t.t()).clamp(min=1e-12).sqrt().numpy()
    # Diagonal entries are sqrt(clamp(~0)) — dominated by fp noise; compare
    # with an absolute tolerance there.
    np.testing.assert_allclose(d, ref, rtol=1e-3, atol=1e-3)


def test_branch_weights_semantics():
    from demo2_tpu.config import get_cfg_defaults
    from demo2_tpu.losses.losses import branch_weights

    # DeMo: first branch gets SDTPS weight when USE_SDTPS (reference quirk:
    # also applies to the dgaf pair in SDTPS+DGAF configs).
    cfg = get_cfg_defaults()
    cfg.MODEL.USE_SDTPS = True
    cfg.MODEL.SDTPS_LOSS_WEIGHT = 2.0
    w = branch_weights(cfg, ["dgaf"])
    assert w == {"dgaf": 2.0}
    w = branch_weights(cfg, ["sdtps", "ori_r"])
    assert w == {"sdtps": 2.0, "ori_r": 1.0}

    # DeMo_Parallel: per-family weights from the documented config knobs.
    cfg2 = get_cfg_defaults()
    cfg2.MODEL.ARCH = "DeMo_Parallel"
    cfg2.MODEL.USE_SDTPS = True
    cfg2.MODEL.SDTPS_LOSS_WEIGHT = 1.0
    cfg2.MODEL.DGAF_LOSS_WEIGHT = 0.7
    cfg2.MODEL.FUSED_LOSS_WEIGHT = 0.5
    names = [f"{f}_{m}" for f in ("sdtps", "dgaf", "fused") for m in ("rgb", "nir", "tir")]
    w = branch_weights(cfg2, names)
    assert w["sdtps_rgb"] == 1.0 and w["dgaf_nir"] == 0.7 and w["fused_tir"] == 0.5


def test_parallel_loss_parity_flag():
    """MODEL.PARALLEL_LOSS_PARITY reproduces the reference engine exactly:
    only pair 0 (sdtps_rgb) is scaled by SDTPS_LOSS_WEIGHT
    (engine/processor.py:86-96); the per-family weights are ignored."""
    from demo2_tpu.config import get_cfg_defaults
    from demo2_tpu.losses.losses import branch_weights

    cfg = get_cfg_defaults()
    cfg.MODEL.ARCH = "DeMo_Parallel"
    cfg.MODEL.USE_SDTPS = True
    cfg.MODEL.PARALLEL_LOSS_PARITY = True
    cfg.MODEL.SDTPS_LOSS_WEIGHT = 2.0
    cfg.MODEL.DGAF_LOSS_WEIGHT = 0.7
    cfg.MODEL.FUSED_LOSS_WEIGHT = 0.5
    names = [f"{f}_{m}" for f in ("sdtps", "dgaf", "fused") for m in ("rgb", "nir", "tir")]
    w = branch_weights(cfg, names)
    assert w["sdtps_rgb"] == 2.0
    assert all(w[n] == 1.0 for n in names if n != "sdtps_rgb")


def test_sampler_softmax_is_plain_ce(tiny_cfg):
    """DATALOADER.SAMPLER='softmax' -> plain cross-entropy only (reference
    make_loss.py:32-34: no label smooth, no triplet); unknown values raise
    (review round 4: the knob was silently ignored)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import pytest

    from demo2_tpu.losses.losses import make_loss_fn, softmax_cross_entropy

    logits = jax.random.normal(jax.random.PRNGKey(0), (8, 6))
    feat = jax.random.normal(jax.random.PRNGKey(1), (8, 16))
    target = jnp.asarray([0, 0, 1, 1, 2, 2, 3, 3])

    tiny_cfg.DATALOADER.SAMPLER = "softmax"
    ce_only = make_loss_fn(tiny_cfg, 6)
    np.testing.assert_allclose(
        float(ce_only(logits, feat, target)),
        float(softmax_cross_entropy(logits, target)), rtol=1e-6,
    )

    tiny_cfg.DATALOADER.SAMPLER = "softmax_triplet"
    full = make_loss_fn(tiny_cfg, 6)
    assert float(full(logits, feat, target)) != float(ce_only(logits, feat, target))

    tiny_cfg.DATALOADER.SAMPLER = "triplet"
    with pytest.raises(ValueError, match="SAMPLER"):
        make_loss_fn(tiny_cfg, 6)
