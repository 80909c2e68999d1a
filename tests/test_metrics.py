"""On-device CMC/mAP and re-ranking vs the ACTUAL reference implementation.

The oracle here is /root/reference/utils/{metrics,reranking}.py imported
directly (see ref_loader.py) — not a hand-written twin.
"""

import jax.numpy as jnp
import numpy as np
import torch

from demo2_tpu.utils.metrics import cmc_map_device, euclidean_distance
from demo2_tpu.utils.reranking import re_ranking_device

from ref_loader import load_ref

ref_metrics = load_ref("utils.metrics")
ref_reranking = load_ref("utils.reranking")


def _random_eval_problem(seed, num_q=20, num_g=60, num_pids=8, num_cams=4):
    rng = np.random.default_rng(seed)
    distmat = rng.uniform(size=(num_q, num_g)).astype(np.float32)
    q_pids = rng.integers(0, num_pids, num_q)
    g_pids = rng.integers(0, num_pids, num_g)
    q_cams = rng.integers(0, num_cams, num_q)
    g_cams = rng.integers(0, num_cams, num_g)
    return distmat, q_pids, g_pids, q_cams, g_cams


def test_cmc_map_device_matches_reference_market_protocol():
    for seed in range(5):
        distmat, q_pids, g_pids, q_cams, g_cams = _random_eval_problem(seed)
        ref_cmc, ref_map = ref_metrics.eval_func(
            distmat, q_pids, g_pids, q_cams, g_cams
        )
        cmc, mAP = cmc_map_device(
            jnp.asarray(distmat), jnp.asarray(q_pids), jnp.asarray(g_pids),
            jnp.asarray(q_cams), jnp.asarray(g_cams),
        )
        n = len(ref_cmc)
        np.testing.assert_allclose(np.asarray(cmc)[:n], ref_cmc, atol=1e-5)
        np.testing.assert_allclose(float(mAP), ref_map, atol=1e-5)


def test_cmc_map_device_matches_reference_scene_protocol(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)  # reference eval_func_msrv writes ./re.txt
    rng = np.random.default_rng(7)
    distmat, q_pids, g_pids, q_cams, g_cams = _random_eval_problem(11)
    q_sc = rng.integers(0, 3, len(q_pids))
    g_sc = rng.integers(0, 3, len(g_pids))
    ref_cmc, ref_map = ref_metrics.eval_func_msrv(
        distmat, q_pids, g_pids, q_cams, g_cams, q_sc, g_sc
    )
    cmc, mAP = cmc_map_device(
        jnp.asarray(distmat), jnp.asarray(q_pids), jnp.asarray(g_pids),
        jnp.asarray(q_sc), jnp.asarray(g_sc),
    )
    n = len(ref_cmc)
    np.testing.assert_allclose(np.asarray(cmc)[:n], ref_cmc, atol=1e-5)
    np.testing.assert_allclose(float(mAP), ref_map, atol=1e-5)


def test_euclidean_distance():
    rng = np.random.default_rng(0)
    q = rng.normal(size=(5, 8)).astype(np.float32)
    g = rng.normal(size=(7, 8)).astype(np.float32)
    d = np.asarray(euclidean_distance(jnp.asarray(q), jnp.asarray(g)))
    ref = ((q[:, None] - g[None]) ** 2).sum(-1)
    np.testing.assert_allclose(d, ref, atol=1e-4)


def test_reranking_device_matches_reference():
    rng = np.random.default_rng(3)
    qf = rng.normal(size=(12, 16)).astype(np.float32)
    gf = rng.normal(size=(30, 16)).astype(np.float32)
    qf /= np.linalg.norm(qf, axis=1, keepdims=True)
    gf /= np.linalg.norm(gf, axis=1, keepdims=True)
    ref = ref_reranking.re_ranking(
        torch.from_numpy(qf), torch.from_numpy(gf), k1=8, k2=3, lambda_value=0.3
    )
    dev = np.asarray(
        re_ranking_device(jnp.asarray(qf), jnp.asarray(gf), k1=8, k2=3, lambda_value=0.3)
    )
    # fp16 accumulation in the reference vs fp32 on device: loose tolerance,
    # but the RANKING must agree.
    np.testing.assert_allclose(dev, np.asarray(ref, np.float32), atol=2e-3)
    for i in range(ref.shape[0]):
        np.testing.assert_array_equal(np.argsort(dev[i])[:5], np.argsort(ref[i])[:5])


def test_save_rank_list(tmp_path):
    from demo2_tpu.visualize.rank_list import save_rank_list

    rng = np.random.default_rng(0)
    distmat = rng.uniform(size=(4, 10)).astype(np.float32)
    q_pids = np.arange(4)
    g_pids = rng.integers(0, 4, 10)
    cams = np.zeros(4, np.int64)
    gcams = np.ones(10, np.int64)
    scenes = np.zeros(4, np.int64)
    gscenes = rng.integers(0, 2, 10)
    p = tmp_path / "re.txt"
    save_rank_list(distmat, q_pids, g_pids, cams, gcams, scenes, gscenes, str(p))
    lines = p.read_text().splitlines()
    assert lines[0] == "rank list file"
    assert len(lines) == 1 + 2 * 4  # header + (query line + rank line) per query


def test_evaluator_reranking_device_vs_host():
    from demo2_tpu.utils.metrics import R1mAPEvaluator

    rng = np.random.default_rng(5)
    nq, ng, c = 10, 24, 16
    feats = rng.normal(size=(nq + ng, c)).astype(np.float32)
    pids = rng.integers(0, 6, nq + ng)
    cams = rng.integers(0, 3, nq + ng)

    results = []
    for on_device in (True, False):
        ev = R1mAPEvaluator(num_query=nq, reranking=True)
        ev.update(feats, pids, cams)
        cmc, mAP = ev.compute(on_device=on_device)
        results.append((cmc, mAP))
    # Same math either way (host path pins to the CPU backend).
    np.testing.assert_allclose(results[0][1], results[1][1], atol=1e-5)
    np.testing.assert_allclose(results[0][0][:5], results[1][0][:5], atol=1e-5)


def test_evaluator_matches_reference_end_to_end(tmp_path, monkeypatch):
    """Full evaluator (no re-ranking) vs reference eval_func on the same
    features, both protocols."""
    monkeypatch.chdir(tmp_path)
    from demo2_tpu.utils.metrics import R1mAPEvaluator

    # Gallery must stay >= max_rank after same-pid+cam removal or the
    # reference's ragged-row np.asarray(all_cmc) blows up (its own fragility).
    rng = np.random.default_rng(9)
    nq, ng, c = 15, 150, 32
    feats = rng.normal(size=(nq + ng, c)).astype(np.float32)
    pids = rng.integers(0, 7, nq + ng)
    cams = rng.integers(0, 4, nq + ng)
    scenes = rng.integers(0, 3, nq + ng)

    fn = feats / np.linalg.norm(feats, axis=1, keepdims=True)
    dist = ((fn[:nq, None] - fn[None, nq:]) ** 2).sum(-1)

    ev = R1mAPEvaluator(num_query=nq)
    ev.update(feats, pids, cams)
    cmc, mAP = ev.compute()
    ref_cmc, ref_map = ref_metrics.eval_func(dist, pids[:nq], pids[nq:], cams[:nq], cams[nq:])
    np.testing.assert_allclose(cmc[: len(ref_cmc)], ref_cmc, atol=1e-4)
    np.testing.assert_allclose(mAP, ref_map, atol=1e-4)

    ev = R1mAPEvaluator(num_query=nq, scene_protocol=True)
    ev.update(feats, pids, cams, scenes)
    cmc, mAP = ev.compute()
    ref_cmc, ref_map = ref_metrics.eval_func_msrv(
        dist, pids[:nq], pids[nq:], cams[:nq], cams[nq:], scenes[:nq], scenes[nq:]
    )
    np.testing.assert_allclose(cmc[: len(ref_cmc)], ref_cmc, atol=1e-4)
    np.testing.assert_allclose(mAP, ref_map, atol=1e-4)
