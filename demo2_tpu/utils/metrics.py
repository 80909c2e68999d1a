"""Re-ID evaluation: CMC / mAP, market1501 + MSVR310 protocols.

Reference: utils/metrics.py — `eval_func` (market1501 protocol, same-pid+
same-cam gallery removal, :110-169), `eval_func_msrv` (MSVR310 protocol,
same-pid+same-SCENE removal, :12-108), evaluators `R1_mAP_eval` (:221-369)
and `R1_mAP` (:172-218).

TPU-first: the reference computes the distance matrix and a per-query Python
CMC loop on CPU/numpy (hot loop, SURVEY §3.5).  Here the whole evaluation —
distmat (one GEMM), ranking, protocol filtering, CMC and AP — is a fully
vectorized jnp computation: per-query variable-length "kept" lists become
cumulative-position arithmetic over masks.  Parity is asserted against a
direct import of the reference implementation in tests/test_metrics.py;
`on_device=False` runs the same vectorized math pinned to the host CPU
backend (useful when accelerator memory is tight at eval time).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

def euclidean_distance(qf: jnp.ndarray, gf: jnp.ndarray) -> jnp.ndarray:
    """Squared-expanded euclidean distmat (reference: metrics.py:395-401)."""
    qf = qf.astype(jnp.float32)
    gf = gf.astype(jnp.float32)
    qq = jnp.sum(jnp.square(qf), axis=1, keepdims=True)
    gg = jnp.sum(jnp.square(gf), axis=1, keepdims=True).T
    return qq + gg - 2.0 * qf @ gf.T


def cmc_map_device(
    distmat: jnp.ndarray,
    q_pids: jnp.ndarray,
    g_pids: jnp.ndarray,
    q_filter_ids: jnp.ndarray,
    g_filter_ids: jnp.ndarray,
    max_rank: int = 50,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Vectorized CMC/mAP.

    `q_filter_ids`/`g_filter_ids` are camera ids for the market1501 protocol
    or scene ids for MSVR310 — gallery entries with same pid AND same filter
    id as the query are discarded, exactly as in the reference loops.
    """
    num_g = distmat.shape[1]
    max_rank = min(max_rank, num_g)
    order = jnp.argsort(distmat, axis=1)  # (Q, G)
    g_pids_s = g_pids[order]
    g_filt_s = g_filter_ids[order]
    matches = g_pids_s == q_pids[:, None]
    remove = matches & (g_filt_s == q_filter_ids[:, None])
    keep = ~remove

    kept_pos = jnp.cumsum(keep, axis=1)  # 1-based position among kept
    mk = matches & keep  # kept matches, sorted order
    valid = jnp.any(mk, axis=1)
    num_valid = jnp.sum(valid.astype(jnp.float32))

    # CMC: hit at rank r iff the first kept-match position <= r.
    first_pos = jnp.min(jnp.where(mk, kept_pos, num_g + 1), axis=1)  # (Q,)
    ranks = jnp.arange(1, max_rank + 1)
    cmc_hits = (first_pos[:, None] <= ranks[None, :]) & valid[:, None]
    cmc = jnp.sum(cmc_hits.astype(jnp.float32), axis=0) / jnp.maximum(num_valid, 1)

    # AP: mean precision at each kept match position.
    cum_matches = jnp.cumsum(mk, axis=1)
    prec = jnp.where(mk, cum_matches / jnp.maximum(kept_pos, 1), 0.0)
    num_rel = jnp.sum(mk, axis=1)
    ap = jnp.sum(prec, axis=1) / jnp.maximum(num_rel, 1)
    mean_ap = jnp.sum(jnp.where(valid, ap, 0.0)) / jnp.maximum(num_valid, 1)
    return cmc, mean_ap


@dataclasses.dataclass
class R1mAPEvaluator:
    """Feature accumulator + on-device compute.

    Mirrors the reset/update/compute protocol of R1_mAP_eval
    (reference: metrics.py:221-369) and R1_mAP for MSVR310 (:172-218).
    """

    num_query: int
    max_rank: int = 50
    feat_norm: bool = True
    reranking: bool = False
    scene_protocol: bool = False  # MSVR310: filter by scene instead of cam

    def __post_init__(self):
        self.reset()

    def reset(self):
        self.feats: List[np.ndarray] = []
        self.pids: List[np.ndarray] = []
        self.camids: List[np.ndarray] = []
        self.sceneids: List[np.ndarray] = []

    def update(self, feat, pid, camid, sceneid=None):
        self.feats.append(np.asarray(feat))
        self.pids.append(np.asarray(pid))
        self.camids.append(np.asarray(camid))
        if sceneid is not None:
            self.sceneids.append(np.asarray(sceneid))

    def compute(self, on_device: bool = True, rank_list_path=None):
        if on_device:
            return self._compute(rank_list_path=rank_list_path)
        with jax.default_device(jax.devices("cpu")[0]):
            return self._compute(rank_list_path=rank_list_path)

    def _compute(self, rank_list_path=None):
        feats = np.concatenate(self.feats, axis=0)
        pids = np.concatenate(self.pids)
        camids = np.concatenate(self.camids)
        scenes = np.concatenate(self.sceneids) if self.sceneids else None

        f = jnp.asarray(feats)
        if self.feat_norm:
            f = f / jnp.maximum(jnp.linalg.norm(f, axis=1, keepdims=True), 1e-12)
        nq = self.num_query
        qf, gf = f[:nq], f[nq:]

        # Reference parity: a protocol where NO query identity appears in
        # the gallery is a broken split, not a 0-mAP model (utils/metrics.py
        # "Error: all query identities do not appear in gallery" assert).
        # Checked BEFORE the distmat/re-ranking pass — metadata alone decides
        # it, and re-ranking at dataset scale costs minutes.
        if not np.any(np.isin(np.asarray(pids[:nq]), np.asarray(pids[nq:]))):
            raise AssertionError(
                "all query identities do not appear in gallery — check "
                "num_query / the query-gallery split"
            )

        if self.reranking:
            # k1=50, k2=15, lambda=0.3 (reference: metrics.py:357-359).
            from .reranking import re_ranking_device

            distmat = re_ranking_device(qf, gf, k1=50, k2=15, lambda_value=0.3)
        else:
            distmat = euclidean_distance(qf, gf)

        filt = scenes if self.scene_protocol else camids
        if rank_list_path is not None:
            # Reference writes a per-query rank list during MSVR310 eval
            # (utils/metrics.py:70-77).
            from ..visualize.rank_list import save_rank_list

            save_rank_list(
                np.asarray(distmat), pids[:nq], pids[nq:], camids[:nq], camids[nq:],
                scenes[:nq] if scenes is not None else None,
                scenes[nq:] if scenes is not None else None,
                path=rank_list_path,
            )
        cmc, mAP = cmc_map_device(
            jnp.asarray(distmat),
            jnp.asarray(pids[:nq]),
            jnp.asarray(pids[nq:]),
            jnp.asarray(filt[:nq]),
            jnp.asarray(filt[nq:]),
            self.max_rank,
        )
        return np.asarray(cmc), float(mAP)
