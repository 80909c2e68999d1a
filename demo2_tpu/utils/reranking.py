"""k-reciprocal re-ranking (CVPR'17), TPU-native.

Reference: utils/reranking.py:29-101 (invoked with k1=50, k2=15, lambda=0.3
from metrics.py:357-359).

`re_ranking_device` is a TPU-native reformulation: the k-reciprocal sets
become boolean rank masks, the 2/3-overlap expansion becomes one boolean
matmul, and the Jaccard distance is computed as a blocked sum of elementwise
minima on the VPU — no Python loops over samples.  Parity with the original
algorithm is asserted against a direct import of the reference code in
tests/test_metrics.py.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _rank_positions(dist: jnp.ndarray) -> jnp.ndarray:
    """ranks[i, j] = position of j in ascending sort of row i."""
    order = jnp.argsort(dist, axis=1)
    n = dist.shape[1]
    ranks = jnp.zeros_like(order)
    rows = jnp.arange(dist.shape[0])[:, None]
    return ranks.at[rows, order].set(jnp.broadcast_to(jnp.arange(n)[None, :], order.shape))


def re_ranking_device(
    prob_fea: jnp.ndarray,
    gal_fea: jnp.ndarray,
    k1: int = 50,
    k2: int = 15,
    lambda_value: float = 0.3,
    block: int = 256,
) -> jnp.ndarray:
    """Vectorized k-reciprocal re-ranking on device.

    Same math as the reference on non-degenerate inputs; the per-sample
    Python set expansion becomes mask algebra:
      fwd      = top-(k1+1) mask;  R = fwd & fwd^T  (k-reciprocal sets)
      Rh       = top-(k1/2+1) reciprocal sets
      expand_i = R_i | union{ Rh_j : j in R_i, |Rh_j ∩ R_i| > 2/3 |Rh_j| }
    and the Jaccard numerator sum_k min(V_i_k, V_j_k) is a blocked VPU sum.
    """
    f32 = jnp.float32
    query_num = prob_fea.shape[0]
    feat = jnp.concatenate([prob_fea, gal_fea], axis=0).astype(f32)
    n = feat.shape[0]
    sq = jnp.sum(jnp.square(feat), axis=1)
    dist = sq[:, None] + sq[None, :] - 2.0 * feat @ feat.T
    dist = (dist / jnp.max(dist, axis=0, keepdims=True)).T

    ranks = _rank_positions(dist)
    fwd = ranks <= k1
    half = int(np.around(k1 / 2))
    fwd_h = ranks <= half
    R = fwd & fwd.T
    Rh = fwd_h & fwd_h.T

    Rf = R.astype(f32)
    Rhf = Rh.astype(f32)
    inter = Rf @ Rhf.T  # inter[i, j] = |R_i ∩ Rh_j|
    sizes_h = jnp.sum(Rhf, axis=1)  # |Rh_j|
    cond = R & (inter > (2.0 / 3.0) * sizes_h[None, :])
    expanded = R | ((cond.astype(f32) @ Rhf) > 0)

    w = jnp.where(expanded, jnp.exp(-dist), 0.0)
    V = w / jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-12)

    if k2 != 1:
        topk2 = (ranks <= (k2 - 1)).astype(f32)
        V = (topk2 @ V) / k2

    # Blocked Jaccard: temp_min[i, j] = sum_k min(V[i, k], V[j, k]).
    # Double-blocked over (i, j) so the (bi, bj, N) broadcast stays in budget.
    bi = min(block, 64)
    bj = min(block, 256)
    nq_pad = -(-query_num // bi) * bi
    n_pad = -(-n // bj) * bj
    Vq = jnp.pad(V[:query_num], ((0, nq_pad - query_num), (0, 0)))
    Vg = jnp.pad(V, ((0, n_pad - n), (0, 0)))

    def body(idx, acc):
        i = idx // (n_pad // bj)
        j = idx % (n_pad // bj)
        qb = jax.lax.dynamic_slice_in_dim(Vq, i * bi, bi, axis=0)
        gb = jax.lax.dynamic_slice_in_dim(Vg, j * bj, bj, axis=0)
        tm = jnp.sum(jnp.minimum(qb[:, None, :], gb[None, :, :]), axis=-1)
        return jax.lax.dynamic_update_slice(acc, tm, (i * bi, j * bj))

    acc = jnp.zeros((nq_pad, n_pad), f32)
    acc = jax.lax.fori_loop(0, (nq_pad // bi) * (n_pad // bj), body, acc)
    temp_min = acc[:query_num, :n]

    jaccard = 1.0 - temp_min / (2.0 - temp_min)
    final = jaccard * (1 - lambda_value) + dist[:query_num] * lambda_value
    return final[:, query_num:]
