"""Parity tests for the metric-learning loss zoo vs the direct-imported
reference (layers/metric_learning.py, cluster_loss.py, range_loss.py,
hcloss.py, mutilmargin.py, supcontrast.py).

The reference's Arcface/Cosface/AMSoftmax hardcode ``device='cuda'`` in
their one-hot scatter (metric_learning.py:113,148,186); the ``cpu_zeros``
fixture shims ``torch.zeros`` to ignore the device kwarg so the oracle runs
on this CPU-only box.  Everything else is CPU-safe as written (ClusterLoss
and RangeLoss take ``use_gpu=False``).
"""

import numpy as np
import pytest
import torch

from ref_loader import load_ref

from demo2_tpu.losses import metric_learning as ml

P, K, D, C = 4, 4, 32, 12
N = P * K


@pytest.fixture
def cpu_zeros(monkeypatch):
    orig = torch.zeros

    def zeros(*args, **kwargs):
        kwargs.pop("device", None)
        return orig(*args, **kwargs)

    monkeypatch.setattr(torch, "zeros", zeros)


@pytest.fixture
def batch():
    rng = np.random.RandomState(0)
    feat = rng.randn(N, D).astype(np.float32)
    labels = np.repeat(np.arange(P), K).astype(np.int64)  # PK contiguous
    weight = rng.randn(C, D).astype(np.float32)
    return feat, labels, weight


def test_arcface(batch, cpu_zeros):
    ref_mod = load_ref("layers.metric_learning")
    feat, labels, weight = batch
    for easy, ls in [(False, 0.0), (True, 0.0), (False, 0.1)]:
        ref = ref_mod.Arcface(D, C, s=30.0, m=0.3, easy_margin=easy, ls_eps=ls)
        with torch.no_grad():
            ref.weight.copy_(torch.from_numpy(weight))
            want = ref(torch.from_numpy(feat), torch.from_numpy(labels)).numpy()
        got = ml.arcface_logits(weight, feat, labels, s=30.0, m=0.3,
                                easy_margin=easy, ls_eps=ls)
        np.testing.assert_allclose(got, want, atol=2e-5)


def test_cosface_and_amsoftmax(batch, cpu_zeros):
    ref_mod = load_ref("layers.metric_learning")
    feat, labels, weight = batch
    ref = ref_mod.Cosface(D, C, s=30.0, m=0.3)
    with torch.no_grad():
        ref.weight.copy_(torch.from_numpy(weight))
        want = ref(torch.from_numpy(feat), torch.from_numpy(labels)).numpy()
    got = ml.cosface_logits(weight, feat, labels, s=30.0, m=0.3)
    np.testing.assert_allclose(got, want, atol=2e-5)

    # AMSoftmax: reference stores W as (in, out) and normalizes columns —
    # same math as cosface on W.T (metric_learning.py:176-189).
    ref2 = ref_mod.AMSoftmax(D, C, s=30.0, m=0.3)
    with torch.no_grad():
        ref2.W.copy_(torch.from_numpy(weight.T))
        want2 = ref2(torch.from_numpy(feat), torch.from_numpy(labels)).numpy()
    got2 = ml.am_softmax_logits(weight, feat, labels, s=30.0, m=0.3)
    np.testing.assert_allclose(got2, want2, atol=2e-5)


def test_circle(batch):
    ref_mod = load_ref("layers.metric_learning")
    feat, labels, weight = batch
    ref = ref_mod.CircleLoss(D, C, s=96, m=0.25)
    with torch.no_grad():
        ref.weight.copy_(torch.from_numpy(weight))
        want = ref(torch.from_numpy(feat), torch.from_numpy(labels)).numpy()
    got = ml.circle_logits(weight, feat, labels, s=96.0, m=0.25)
    np.testing.assert_allclose(got, want, atol=3e-4)


def test_contrastive(batch):
    ref_mod = load_ref("layers.metric_learning")
    feat, labels, _ = batch
    # Normalize so self-similarity == 1 is actually dropped by the sim<1
    # filter, as in real use on normalized embeddings.
    featn = feat / np.linalg.norm(feat, axis=1, keepdims=True)
    ref = ref_mod.ContrastiveLoss(margin=0.3)
    want = ref(torch.from_numpy(featn), torch.from_numpy(labels)).item()
    got = float(ml.contrastive_loss(featn, labels, margin=0.3))
    assert abs(got - want) < 1e-4


def test_cluster(batch):
    ref_mod = load_ref("layers.cluster_loss")
    feat, labels, _ = batch
    ref = ref_mod.ClusterLoss(margin=10, use_gpu=False, ordered=True,
                              ids_per_batch=P, imgs_per_id=K)
    want, want_ap, want_an = ref(torch.from_numpy(feat), torch.from_numpy(labels))
    got, got_ap, got_an = ml.cluster_loss(feat, k=K, margin=10.0)
    assert abs(float(got) - want.item()) < 1e-4
    np.testing.assert_allclose(got_ap, want_ap.numpy(), atol=1e-4)
    np.testing.assert_allclose(got_an, want_an.numpy(), atol=1e-4)


def test_range(batch):
    ref_mod = load_ref("layers.range_loss")
    feat, labels, _ = batch
    ref = ref_mod.RangeLoss(k=2, margin=0.1, alpha=0.5, beta=0.5,
                            use_gpu=False, ordered=True,
                            ids_per_batch=P, imgs_per_id=K)
    want, want_intra, want_inter = ref(
        torch.from_numpy(feat), torch.from_numpy(labels)
    )
    got, got_intra, got_inter = ml.range_loss(
        feat, k_instances=K, top_k=2, margin=0.1, alpha=0.5, beta=0.5
    )
    assert abs(float(got_intra) - want_intra.item()) < 1e-3
    assert abs(float(got_inter) - want_inter.item()) < 1e-4
    assert abs(float(got) - want.item()) < 1e-3


@pytest.mark.parametrize("dist_type", ["l2", "l1", "cos"])
def test_hetero(batch, dist_type):
    ref_mod = load_ref("layers.hcloss")
    feat, labels, _ = batch
    rng = np.random.RandomState(1)
    feat2 = rng.randn(N, D).astype(np.float32)
    ref = ref_mod.hetero_loss(margin=0.1, dist_type=dist_type)
    want = ref(torch.from_numpy(feat), torch.from_numpy(feat2),
               torch.from_numpy(labels))
    got = float(ml.hetero_loss(feat, feat2, k=K, dist_type=dist_type))
    assert abs(got - float(want)) < 1e-3


@pytest.mark.parametrize("dist_type", ["l2", "l1"])
def test_multimodal_margin(batch, dist_type):
    ref_mod = load_ref("layers.mutilmargin")
    feat, labels, _ = batch
    rng = np.random.RandomState(2)
    feat2 = rng.randn(N, D).astype(np.float32)
    feat3 = rng.randn(N, D).astype(np.float32)
    ref = ref_mod.multiModalMarginLossNew(margin=3, dist_type=dist_type)
    want = ref(torch.from_numpy(feat), torch.from_numpy(feat2),
               torch.from_numpy(feat3), torch.from_numpy(labels))
    got = float(ml.multimodal_margin_loss(feat, feat2, feat3, k=K,
                                          margin=3.0, dist_type=dist_type))
    assert abs(got - float(want)) < 1e-3


def test_supcon(batch):
    ref_mod = load_ref("layers.supcontrast")
    feat, labels, _ = batch
    rng = np.random.RandomState(3)
    img = rng.randn(N, D).astype(np.float32)
    ref = ref_mod.SupConLoss(device="cpu")
    want = ref(torch.from_numpy(feat), torch.from_numpy(img),
               torch.from_numpy(labels), torch.from_numpy(labels)).item()
    got = float(ml.supcon_loss(feat, img, labels, labels))
    assert abs(got - want) < 1e-4


def test_margin_heads_are_jittable_and_differentiable(batch):
    """The zoo must drop into a jitted train step: grads flow to the weight."""
    import jax
    import jax.numpy as jnp

    feat, labels, weight = batch

    @jax.jit
    def loss(w):
        logits = ml.arcface_logits(w, feat, labels)
        logp = jax.nn.log_softmax(logits)
        return -jnp.mean(jnp.take_along_axis(logp, jnp.asarray(labels)[:, None], 1))

    g = jax.grad(loss)(jnp.asarray(weight))
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).max()) > 0
