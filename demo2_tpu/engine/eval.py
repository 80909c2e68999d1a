"""Inference engine: jitted feature extraction + on-device metrics.

Reference: engine/processor.py `do_inference` (:193-244) and
`training_neat_eval` (:247-282) — batch loop collecting features on CPU,
then numpy distmat + CMC (the reference's CPU hot spot, SURVEY §3.5).

Here feature extraction is a jitted data-parallel forward; missing-modality
simulation (TEST.MISS, reference make_model.py:718-724) enters the SAME
graph as a (3,) multiplicative mask, so the full-modality and every
missing-modality sweep share one compiled executable.
"""

from __future__ import annotations

import logging
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config.defaults import Config
from ..parallel.mesh import batch_sharding, replicated_sharding
from ..utils.metrics import R1mAPEvaluator

logger = logging.getLogger("DeMo")

MISS_MASKS = {
    "None": (1.0, 1.0, 1.0),
    "nothing": (1.0, 1.0, 1.0),  # alias used by reference YAMLs
    "r": (0.0, 1.0, 1.0),
    "n": (1.0, 0.0, 1.0),
    "t": (1.0, 1.0, 0.0),
    "rn": (0.0, 0.0, 1.0),
    "rt": (0.0, 1.0, 0.0),
    "nt": (1.0, 0.0, 0.0),
}


def build_eval_step(cfg: Config, model, mesh=None, device_cache=None):
    """With ``device_cache`` the step takes (params, batch_stats,
    cache_images, cache_camids, cache_viewids, idx, mask, pattern) and
    gathers+normalizes the batch from the HBM uint8 cache in-graph
    (data/device_cache.py)."""

    def eval_step(params, batch_stats, images, camids, viewids, mask, return_pattern):
        out = model.apply(
            {"params": params, "batch_stats": batch_stats},
            images,
            camids,
            viewids,
            mask,
            train=False,
            return_pattern=return_pattern,
        )
        return out["embedding"]

    if device_cache is not None:
        from ..data.device_cache import normalize_batch

        dc = device_cache

        def eval_step_cached(params, batch_stats, cimg, ccam, cview, idx, mask,
                             return_pattern):
            take = lambda a: jnp.take(a, idx, axis=0, mode="clip")
            images = normalize_batch(take(cimg), dc.mean, dc.std)
            return eval_step(params, batch_stats, images, take(ccam), take(cview),
                             mask, return_pattern)

        if mesh is not None:
            repl = replicated_sharding(mesh)
            bsh = batch_sharding(mesh)
            out = repl if jax.process_count() > 1 else bsh
            return jax.jit(
                eval_step_cached,
                in_shardings=(repl, repl, repl, repl, repl, bsh, repl),
                out_shardings=out,
                static_argnums=(7,),
            )
        return jax.jit(eval_step_cached, static_argnums=(7,))

    if mesh is not None:
        repl = replicated_sharding(mesh)
        bsh = batch_sharding(mesh)
        # Multi-process: replicate the features (an in-graph all-gather over
        # ICI) so every host materializes the full matrix and computes
        # identical CMC/mAP — the reference's rank-0 eval
        # (processor.py:146-148), made symmetric.
        out = repl if jax.process_count() > 1 else bsh
        return jax.jit(
            eval_step,
            in_shardings=(repl, repl, bsh, bsh, bsh, repl),
            out_shardings=out,
            static_argnums=(6,),
        )
    return jax.jit(eval_step, static_argnums=(6,))


def run_eval(
    cfg: Config,
    eval_step,
    state,
    val_pipe,
    num_query: int,
    return_pattern: int = 3,
    rank_list_path: Optional[str] = None,
    mesh=None,
    device_cache=None,
) -> Tuple[np.ndarray, float]:
    """Extract features over query+gallery and compute CMC/mAP.

    With ``mesh`` the input goes through the host-sharded path
    (parallel/multihost.py): each process decodes only its rows; metadata is
    global on every host, so all hosts compute the same metrics.  With
    ``device_cache`` (built by data/device_cache.build_device_cache over
    ``val_pipe``) only index batches are fed and the decode happens zero
    times per eval — `eval_step` must then come from
    `build_eval_step(..., device_cache=...)`.
    """
    scene_protocol = cfg.DATASETS.NAMES == "MSVR310"
    evaluator = R1mAPEvaluator(
        num_query=num_query,
        feat_norm=cfg.TEST.FEAT_NORM == "yes",
        reranking=cfg.TEST.RE_RANKING == "yes",
        scene_protocol=scene_protocol,
    )
    miss = str(cfg.TEST.MISS)
    if miss not in MISS_MASKS:
        # Reject typos ('R', 'rnt', ...) with the legal values instead of a
        # bare KeyError after a full training epoch.
        raise ValueError(
            f"TEST.MISS={cfg.TEST.MISS!r} is not a valid missing-modality "
            f"pattern; expected one of {sorted(MISS_MASKS)}"
        )
    mask = jnp.asarray(MISS_MASKS[miss], jnp.float32)
    order = np.arange(len(val_pipe.samples))

    if device_cache is not None:
        from ..parallel.multihost import iter_index_batches

        meta = val_pipe.samples
        pids_np = np.asarray([m[1] for m in meta], np.int32)
        cams_np = np.asarray([m[2] for m in meta], np.int32)
        views_np = np.asarray([m[3] for m in meta], np.int32)
        cursor = 0  # iter_index_batches consumes `order` sequentially
        for idx_g, valid in iter_index_batches(
            mesh, order, val_pipe.batch_size, drop_last=False, pad_last=True
        ):
            feat = eval_step(
                state.params, state.batch_stats, device_cache.images,
                device_cache.camids, device_cache.viewids, idx_g, mask,
                return_pattern,
            )
            sel = np.asarray(order[cursor : cursor + valid], np.int64)
            cursor += valid
            evaluator.update(
                np.asarray(feat)[:valid],
                pids_np[sel],
                cams_np[sel],
                views_np[sel] if scene_protocol else None,
            )
    elif mesh is not None:
        from ..parallel.multihost import HostShardedBatches

        batches = HostShardedBatches(val_pipe, mesh)
        for gb in batches.iter_batches(order, drop_last=False, pad_last=True):
            feat = eval_step(
                state.params, state.batch_stats,
                gb.images, gb.camids, gb.viewids, mask, return_pattern,
            )
            v = gb.valid
            evaluator.update(
                np.asarray(feat)[:v],
                gb.meta_pids[:v],
                gb.meta_camids[:v],
                gb.meta_viewids[:v] if scene_protocol else None,
            )
    else:
        for batch in val_pipe.iter_batches(order, drop_last=False, pad_last=True):
            feat = eval_step(
                state.params,
                state.batch_stats,
                jnp.asarray(batch.images),
                jnp.asarray(batch.camids),
                jnp.asarray(batch.viewids),
                mask,
                return_pattern,
            )
            v = batch.valid
            evaluator.update(
                np.asarray(feat)[:v],
                batch.pids[:v],
                batch.camids[:v],
                batch.viewids[:v] if scene_protocol else None,
            )
    if rank_list_path is None and scene_protocol:
        rank_list_path = "re.txt"  # reference always writes this for MSVR310
    if jax.process_count() > 1 and jax.process_index() != 0:
        rank_list_path = None  # rank-0 writes the rank list file
    cmc, mAP = evaluator.compute(
        on_device=cfg.TPU.EVAL_ON_DEVICE, rank_list_path=rank_list_path
    )
    return np.asarray(cmc), float(mAP)


def do_inference(cfg: Config, model, state, val_pipe, num_query: int,
                 return_pattern: int = 3, mesh=None):
    """`do_inference` equivalent (reference: processor.py:193-244)."""
    val_cache = None
    if cfg.TPU.DATA_CACHE == "device":
        from ..data.device_cache import build_device_cache

        val_cache = build_device_cache(val_pipe, mesh, train=False)
    eval_step = build_eval_step(cfg, model, mesh, device_cache=val_cache)
    cmc, mAP = run_eval(cfg, eval_step, state, val_pipe, num_query,
                        return_pattern, mesh=mesh, device_cache=val_cache)
    logger.info("Validation Results")
    logger.info("mAP: %.1f%%", mAP * 100)
    for r in (1, 5, 10):
        if len(cmc) >= r:
            logger.info("CMC curve, Rank-%d: %.1f%%", r, cmc[r - 1] * 100)
    return cmc, mAP
