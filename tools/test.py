"""Evaluation CLI (reference: test_net.py:9-44).

Usage:
    python tools/test.py --config_file configs/RGBNT201/DeMo.yml \
        TEST.WEIGHT /path/to/checkpoints [TEST.MISS nt] [opts ...]

TEST.WEIGHT accepts either an orbax checkpoint directory (trained here) or a
reference-trained torch ``.pth``/``.pt`` state dict, which is converted on
load (utils/ref_convert) — see docs/MIGRATION.md.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main():
    parser = argparse.ArgumentParser(description="DeMo TPU Testing")
    parser.add_argument("--config_file", default="", type=str)
    parser.add_argument("--return_pattern", default=3, type=int)
    parser.add_argument("opts", nargs=argparse.REMAINDER)
    args = parser.parse_args()

    from demo2_tpu.config import get_cfg_defaults
    from demo2_tpu.data import make_dataloader
    from demo2_tpu.engine import create_train_state
    from demo2_tpu.engine.eval import do_inference
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

    os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)
    logger = setup_logger("DeMo", cfg.OUTPUT_DIR, if_train=False)

    (
        train_pipe,
        sampler,
        val_pipe,
        num_query,
        num_classes,
        cam_num,
        view_num,
    ) = make_dataloader(cfg)
    model = make_model(cfg, num_classes, cam_num, view_num)

    rng = jax.random.PRNGKey(cfg.SOLVER.SEED)
    sample = next(train_pipe.iter_batches(sampler.epoch_indices(0)[: cfg.SOLVER.IMS_PER_BATCH], seed=0))
    state, *_ = create_train_state(cfg, model, rng, sample, 1)

    if cfg.TEST.WEIGHT:
        if cfg.TEST.WEIGHT.endswith((".pth", ".pt")):
            # Reference-trained torch checkpoint (the reference's
            # torch.save(model.state_dict()) files, test_net.py:30):
            # converted in place so reference users evaluate existing
            # models with no extra step.
            from demo2_tpu.utils.ref_convert import load_reference_checkpoint

            state = load_reference_checkpoint(state, cfg.TEST.WEIGHT, cfg)
            logger.info(
                "Converted reference torch checkpoint %s", cfg.TEST.WEIGHT
            )
        else:
            from demo2_tpu.utils.checkpoint import restore_checkpoint

            state = restore_checkpoint(cfg.TEST.WEIGHT, state)
            logger.info("Loaded checkpoint from %s", cfg.TEST.WEIGHT)

    mesh = make_mesh(cfg.TPU.NUM_DEVICES)
    cmc, mAP = do_inference(
        cfg, model, state, val_pipe, num_query, return_pattern=args.return_pattern,
        mesh=mesh,
    )
    logger.info("Done. mAP=%.1f%% Rank-1=%.1f%%", mAP * 100, cmc[0] * 100)


if __name__ == "__main__":
    main()
