"""Smoke tests for the visualization toolkit (reference: utils/metrics.py
rank-list/t-SNE/KDE helpers, visualize/ scripts)."""

import numpy as np
import pytest


def _fake_features(n_ids=6, per_id=4, dim=32, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_ids, dim)) * 3
    feats, pids = [], []
    for i in range(n_ids):
        feats.append(centers[i] + rng.normal(size=(per_id, dim)) * 0.3)
        pids += [i] * per_id
    return np.concatenate(feats).astype(np.float32), np.asarray(pids)


def test_save_rank_list_formats(tmp_path):
    from demo2_tpu.visualize import rank_list

    feats, pids = _fake_features()
    dist = np.linalg.norm(feats[:4, None] - feats[None], axis=-1)
    cams = np.arange(len(pids)) % 3
    # market-style (cam-based junk removal)
    p1 = rank_list.save_rank_list(
        dist, pids[:4], pids, cams[:4], cams, path=str(tmp_path / "re.txt")
    )
    text = open(p1).read()
    assert text.startswith("rank list file")
    assert text.count(":") >= 4
    # MSVR310-style (scene-based removal)
    scenes = np.arange(len(pids)) % 2
    p2 = rank_list.save_rank_list(
        dist, pids[:4], pids, cams[:4], cams, scenes[:4], scenes,
        path=str(tmp_path / "re_scene.txt"),
    )
    assert "_s" in open(p2).read()


def test_similarity_distributions(tmp_path):
    from demo2_tpu.visualize import similarity

    feats, pids = _fake_features()
    out = similarity.similarity_distributions(
        feats[:8], feats, pids[:8], pids, save_path=str(tmp_path / "kde.png")
    )
    # clustered ids -> positives clearly more similar than negatives
    assert out["pos_mean"] > out["neg_mean"] + 0.1
    import os

    assert os.path.getsize(out["path"]) > 500


def test_tsne_plot(tmp_path):
    pytest.importorskip("sklearn")
    pytest.importorskip("matplotlib")
    from demo2_tpu.visualize import embedding

    feats, pids = _fake_features(per_id=6)
    path = embedding.tsne_plot(
        feats, pids, save_path=str(tmp_path / "tsne.pdf"), max_ids=4
    )
    import os

    assert os.path.getsize(path) > 500
