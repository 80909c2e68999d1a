"""Training CLI (reference: train_net.py:33-132).

Usage:
    python tools/train.py --config_file configs/RGBNT201/DeMo.yml \
        [--exp_name NAME] [--fea_cft N] [opts KEY VALUE ...]
"""

from __future__ import annotations

import argparse
import os
import random
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def set_seed(seed: int):
    """Seed host RNGs (reference: train_net.py:18-30; device RNG is the
    explicit jax.random key threaded through the engine)."""
    random.seed(seed)
    np.random.seed(seed)


def main():
    parser = argparse.ArgumentParser(description="DeMo TPU Training")
    parser.add_argument("--config_file", default="", type=str)
    parser.add_argument("--fea_cft", default=0, type=int, help="feature pattern for eval")
    parser.add_argument("--exp_name", default=None, type=str)
    parser.add_argument("--local_rank", default=0, type=int)
    parser.add_argument(
        "--distributed",
        action="store_true",
        help="multi-host: call jax.distributed.initialize() (replaces the "
        "reference's NCCL init_process_group, train_net.py:72-73)",
    )
    parser.add_argument("--resume", default="", type=str,
                        help="checkpoint dir to resume the full train state from")
    parser.add_argument("--init_pth", default="", type=str,
                        help="reference-trained torch .pth state dict to "
                        "initialize the FULL model from (fine-tune a model "
                        "trained with the reference framework; params + "
                        "batch stats only, optimizer state starts fresh)")
    parser.add_argument("opts", nargs=argparse.REMAINDER)
    args = parser.parse_args()

    if args.distributed:
        jax.distributed.initialize()

    from demo2_tpu.config import get_cfg_defaults
    from demo2_tpu.data import make_dataloader
    from demo2_tpu.engine import create_train_state, do_train
    from demo2_tpu.models import make_model
    from demo2_tpu.parallel import make_mesh
    from demo2_tpu.utils.logger import setup_logger

    cfg = get_cfg_defaults()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    cfg.merge_from_list(args.opts)
    # Parity quirk: the reference stores --fea_cft into TEST.FEAT
    # (train_net.py:49) and then never reads it anywhere — the knob is
    # write-only there too. Mirrored verbatim; eval pattern selection is
    # use_moe_eval-driven (engine/train.py), as in processor.py:145-156.
    cfg.TEST.FEAT = args.fea_cft
    cfg.freeze()

    if cfg.MODEL.DEVICE == "cpu":
        # Make the reference's MODEL.DEVICE knob functional: this box's
        # site bootstrap pins JAX_PLATFORMS=axon before user env is read,
        # so CPU smoke runs must switch the platform here, before any
        # backend is touched (same pattern as tests/conftest.py).
        jax.config.update("jax_platforms", "cpu")

    set_seed(cfg.SOLVER.SEED)
    output_dir = cfg.OUTPUT_DIR
    os.makedirs(output_dir, exist_ok=True)
    logger = setup_logger("DeMo", output_dir, if_train=True)
    logger.info("Running with config:\n%s", cfg)
    logger.info("JAX backend: %s, devices: %s", jax.default_backend(), jax.devices())

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

    steps_per_epoch = max(1, len(sampler) // cfg.SOLVER.IMS_PER_BATCH)
    rng = jax.random.PRNGKey(cfg.SOLVER.SEED)
    # Slice to ONE batch of indices: feeding the full epoch would leave the
    # pipe's producer thread decoding ahead into a queue nobody drains.
    sample = next(
        train_pipe.iter_batches(
            sampler.epoch_indices(0)[: cfg.SOLVER.IMS_PER_BATCH], seed=0
        )
    )
    state, tx, center_tx, schedule = create_train_state(
        cfg, model, rng, sample, steps_per_epoch
    )
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
    logger.info("Total parameters: %.2fM", n_params / 1e6)
    # Startup FLOP count (reference: model.flops() via fvcore's hand-kept op
    # table, make_model.py:672-693; here XLA's exact cost model — trace-only,
    # no compile).
    try:
        from demo2_tpu.utils.profiling import model_flops

        import jax.numpy as jnp

        fl = model_flops(
            model,
            {"params": state.params, "batch_stats": state.batch_stats},
            jnp.asarray(sample.images),
            jnp.asarray(sample.camids),
        )
        logger.info("Forward FLOPs (batch %d): %.1f GFLOPs",
                    sample.images.shape[0], fl["flops"] / 1e9)
    except Exception as e:  # cost model availability varies by backend
        logger.info("FLOP count unavailable: %s", e)

    # Optional pretrained backbone weights (reference: meta_arch.py:59,66-71).
    if cfg.MODEL.PRETRAIN_PATH_T:
        if not os.path.exists(cfg.MODEL.PRETRAIN_PATH_T):
            # A typo'd path must not silently train from random init (the
            # reference crashes on the missing file).
            raise FileNotFoundError(
                f"MODEL.PRETRAIN_PATH_T={cfg.MODEL.PRETRAIN_PATH_T!r} does "
                "not exist"
            )
        from demo2_tpu.models.pife import patch_grid_for
        from demo2_tpu.utils.converters import (
            convert_clip_visual,
            convert_imagenet_vit,
            load_torch_state_dict,
            merge_pretrained_backbone,
        )

        sd = load_torch_state_dict(cfg.MODEL.PRETRAIN_PATH_T)
        # The model's OWN grid formula — h//s diverges for non-default
        # strides and would graft a wrong-size positional embedding.
        gh, gw = patch_grid_for(
            cfg.MODEL.TRANSFORMER_TYPE, tuple(cfg.INPUT.SIZE_TRAIN),
            tuple(cfg.MODEL.STRIDE_SIZE),
        )
        if "ViT-B-16" in cfg.MODEL.TRANSFORMER_TYPE:
            bb = convert_clip_visual(sd, gh, gw)
        else:
            bb = convert_imagenet_vit(sd, gh, gw)
        state = state.replace(params=merge_pretrained_backbone(state.params, bb))
        logger.info("Loaded pretrained backbone from %s", cfg.MODEL.PRETRAIN_PATH_T)

    if args.init_pth:
        # Full-model init from a reference-trained torch checkpoint — the
        # fine-tune side of the migration path (docs/MIGRATION.md).  Applied
        # before --resume so an orbax resume still wins if both are given.
        from demo2_tpu.utils.ref_convert import load_reference_checkpoint

        state = load_reference_checkpoint(state, args.init_pth, cfg)
        logger.info("Initialized model from reference checkpoint %s",
                    args.init_pth)

    if args.resume:
        from demo2_tpu.utils.checkpoint import restore_checkpoint

        state = restore_checkpoint(args.resume, state)
        logger.info("Resumed from %s at step %d", args.resume, int(state.step))

    from demo2_tpu.utils.metrics_log import MetricsLogger, TeeWriter

    jsonl = MetricsLogger(
        os.path.join(output_dir, f"{args.exp_name or cfg.MODEL.NAME}_metrics.jsonl")
    )
    tb = None
    try:
        from torch.utils.tensorboard import SummaryWriter

        tb_dir = os.path.join("logs", "tensorboard", args.exp_name or cfg.MODEL.NAME)
        tb = SummaryWriter(tb_dir)
        logger.info("TensorBoard logging to %s", tb_dir)
    except Exception as e:  # TB optional; JSONL metrics are always on
        logger.info("TensorBoard unavailable (%s); JSONL metrics only", e)
    writer = TeeWriter(jsonl, tb)

    mesh = make_mesh(cfg.TPU.NUM_DEVICES)
    state, best = do_train(
        cfg,
        model,
        state,
        tx,
        center_tx,
        train_pipe,
        sampler,
        val_pipe,
        num_query,
        schedule=schedule,
        mesh=mesh,
        writer=writer,
        checkpoint_dir=os.path.join(output_dir, "checkpoints"),
    )
    logger.info("Training done. Best: %s", best)


if __name__ == "__main__":
    main()
