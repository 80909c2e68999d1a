"""Missing-modality evaluation sweep.

Reference workflow: re-run `test_net.py` once per TEST.MISS value, each run
re-tracing the model (config: defaults.py:212, zeroing at
make_model.py:718-724).  Here all 7 conditions (full, r, n, t, rn, rt, nt)
reuse ONE compiled executable — the modality mask is a runtime input.

Usage:
    python tools/miss_sweep.py --config_file configs/RGBNT201/DeMo_SDTPS_DGAF.yml \
        [TEST.WEIGHT output/checkpoints_best] [opts ...]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_file", default="", type=str)
    parser.add_argument("opts", nargs=argparse.REMAINDER)
    args = parser.parse_args()

    from demo2_tpu.config import get_cfg_defaults
    from demo2_tpu.data import make_dataloader
    from demo2_tpu.engine import create_train_state
    from demo2_tpu.engine.eval import MISS_MASKS, build_eval_step, run_eval
    from demo2_tpu.models import make_model
    from demo2_tpu.parallel import make_mesh
    from demo2_tpu.utils.logger import setup_logger

    cfg = get_cfg_defaults()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    cfg.merge_from_list(args.opts)
    cfg.freeze()

    if cfg.MODEL.DEVICE == "cpu":
        # MODEL.DEVICE=cpu forces the CPU platform (see tools/train.py).
        jax.config.update("jax_platforms", "cpu")

    logger = setup_logger("DeMo", cfg.OUTPUT_DIR, if_train=False)
    train_pipe, sampler, val_pipe, num_query, num_classes, cam_num, view_num = (
        make_dataloader(cfg)
    )
    model = make_model(cfg, num_classes, cam_num, view_num)
    rng = jax.random.PRNGKey(cfg.SOLVER.SEED)
    sample = next(
        train_pipe.iter_batches(sampler.epoch_indices(0)[: cfg.SOLVER.IMS_PER_BATCH], seed=0)
    )
    state, *_ = create_train_state(cfg, model, rng, sample, 1)
    if cfg.TEST.WEIGHT:
        from demo2_tpu.utils.checkpoint import restore_checkpoint

        state = restore_checkpoint(cfg.TEST.WEIGHT, state)

    mesh = make_mesh(cfg.TPU.NUM_DEVICES)
    # Device cache pairing must match the step (as in do_inference): one
    # decode, all 7 sweep passes from HBM.
    val_cache = None
    if cfg.TPU.DATA_CACHE == "device":
        from demo2_tpu.data.device_cache import build_device_cache

        val_cache = build_device_cache(val_pipe, mesh, train=False)
    eval_step = build_eval_step(cfg, model, mesh, device_cache=val_cache)

    results = {}
    for miss in ("None", "r", "n", "t", "rn", "rt", "nt"):
        cfg.defrost()
        cfg.TEST.MISS = miss
        cfg.freeze()
        cmc, mAP = run_eval(cfg, eval_step, state, val_pipe, num_query,
                            mesh=mesh, device_cache=val_cache)
        results[miss] = (mAP, cmc[0])
        logger.info("MISS=%-4s mAP=%.1f%% Rank-1=%.1f%%", miss, mAP * 100, cmc[0] * 100)

    logger.info("%-6s %8s %8s", "miss", "mAP", "Rank-1")
    for miss, (mAP, r1) in results.items():
        logger.info("%-6s %7.1f%% %7.1f%%", miss, mAP * 100, r1 * 100)


if __name__ == "__main__":
    main()
