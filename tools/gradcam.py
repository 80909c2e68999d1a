"""Grad-CAM visualization CLI (reference: visualize/GradCAM.py).

Dumps class-conditional CAM overlays (jet heatmap alpha-blended on the
input) per modality for the first validation batches, like the reference's
pytorch_grad_cam driver — but through the functional patch-perturb probe
(demo2_tpu.visualize.gradcam), so no hooks or model surgery are needed.

Usage:
    python tools/gradcam.py --config_file configs/RGBNT201/DeMo_SDTPS_DGAF.yml \
        [--batches 1] [--out gradcam_vis] [TEST.WEIGHT /path/to/ckpt] [opts...]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    parser = argparse.ArgumentParser(description="DeMo TPU Grad-CAM")
    parser.add_argument("--config_file", default="", type=str)
    parser.add_argument("--batches", default=1, type=int)
    parser.add_argument("--out", default="gradcam_vis", type=str)
    parser.add_argument("--branch", default=None, type=str,
                        help="branch whose classifier drives the CAM "
                             "(default: the model's first branch)")
    parser.add_argument("opts", nargs=argparse.REMAINDER)
    args = parser.parse_args()

    from demo2_tpu.config import get_cfg_defaults
    from demo2_tpu.data import make_dataloader
    from demo2_tpu.engine import create_train_state
    from demo2_tpu.models import make_model
    from demo2_tpu.utils.logger import setup_logger
    from demo2_tpu.visualize import gradcam, save_gradcam_overlays

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

    train_pipe, sampler, val_pipe, num_query, nc, cams, views = make_dataloader(cfg)
    model = make_model(cfg, nc, cams, views)
    rng = jax.random.PRNGKey(cfg.SOLVER.SEED)
    sample = next(
        train_pipe.iter_batches(
            sampler.epoch_indices(0)[: cfg.SOLVER.IMS_PER_BATCH], seed=0
        )
    )
    state, *_ = create_train_state(cfg, model, rng, sample, 1)
    if cfg.TEST.WEIGHT:
        from demo2_tpu.utils.checkpoint import restore_checkpoint

        state = restore_checkpoint(cfg.TEST.WEIGHT, state)
        logger.info("Loaded checkpoint from %s", cfg.TEST.WEIGHT)

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    out_dir = os.path.join(cfg.OUTPUT_DIR, args.out)
    order = np.arange(len(val_pipe.samples))
    written = []
    for n_iter, batch in enumerate(
        val_pipe.iter_batches(order, drop_last=False, pad_last=True)
    ):
        if n_iter >= args.batches:
            break
        maps = gradcam(
            model,
            variables,
            jnp.asarray(batch.images),
            jnp.asarray(batch.camids),
            branch=args.branch,
        )
        v = batch.valid
        written += save_gradcam_overlays(
            maps[:, :v],
            np.asarray(batch.images[:v]),
            out_dir,
            prefix=f"b{n_iter}",
        )
    logger.info("Wrote %d CAM overlays to %s", len(written), out_dir)


if __name__ == "__main__":
    main()
