"""Serving module: AOT-compiled extractor + on-device matcher."""

import jax
import numpy as np

from demo2_tpu.models import make_model
from demo2_tpu.serving import FeatureExtractor, match


def test_feature_extractor_ragged_batches(tiny_cfg):
    cfg = tiny_cfg
    cfg.freeze()
    model = make_model(cfg, num_class=6, camera_num=4)
    h, w = cfg.INPUT.SIZE_TEST
    rng = jax.random.PRNGKey(0)
    import jax.numpy as jnp

    imgs0 = jnp.zeros((4, 3, h, w, 3))
    variables = model.init({"params": rng}, imgs0, jnp.zeros((4,), jnp.int32), train=False)

    fx = FeatureExtractor(cfg, model, variables, batch_size=4)
    images = np.random.default_rng(0).normal(size=(6, 3, h, w, 3)).astype(np.float32)
    emb = fx.extract(images)
    assert emb.shape == (6, 3 * 512)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, rtol=1e-4)
    # Ragged result equals per-chunk results (padding is dropped).
    emb2 = fx.extract(images[:4])
    np.testing.assert_allclose(emb[:4], emb2, rtol=1e-5, atol=1e-5)
    # Missing-modality config compiles separately and differs.
    emb_miss = fx.extract(images, miss="nt")
    assert not np.allclose(emb, emb_miss)


def test_match_topk():
    q = np.random.default_rng(1).normal(size=(3, 8)).astype(np.float32)
    g = np.concatenate([q + 0.01, np.random.default_rng(2).normal(size=(5, 8)).astype(np.float32)])
    idx, dist = match(q, g, topk=3)
    assert idx.shape == (3, 3)
    np.testing.assert_array_equal(idx[:, 0], [0, 1, 2])  # nearest = its copy
    assert np.all(np.diff(dist, axis=1) >= -1e-5)
