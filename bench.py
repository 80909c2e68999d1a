"""Benchmark: tri-modal training throughput on the flagship config.

Measures the jitted train-step throughput (images/sec/chip) for the
production RGBNT201 configuration — DeMo with SDTPS + DGAF v3 over the
CLIP ViT-B/16 backbone, global batch 64, bf16 compute — against the
reference anchor of ~203.9 samples/s on a single CUDA GPU with AMP+TF32
(BASELINE.md; logs/RGBNT201_ablation_SDTPS_DGAF_20251207_115040/
SDTPS_DGAFv3.log).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

# Persistent compilation cache: the remote-compile path is slow (minutes for
# the full train step), but cached executables reload in seconds.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

BASELINE_SAMPLES_PER_SEC = 203.9


def main():
    from demo2_tpu.config import get_cfg_defaults
    from demo2_tpu.data import Batch
    from demo2_tpu.engine import create_train_state
    from demo2_tpu.engine.train import build_train_step
    from demo2_tpu.models import make_model
    from demo2_tpu.parallel import make_mesh

    on_tpu = jax.default_backend() in ("tpu", "axon")

    cfg = get_cfg_defaults()
    cfg.MODEL.TRANSFORMER_TYPE = "ViT-B-16"
    cfg.MODEL.USE_SDTPS = True
    cfg.MODEL.USE_DGAF = True
    cfg.MODEL.DGAF_VERSION = "v3"
    cfg.MODEL.ID_LOSS_WEIGHT = 0.25
    cfg.MODEL.TRIPLET_LOSS_WEIGHT = 1.0
    cfg.SOLVER.OPTIMIZER_NAME = "Adam"
    cfg.SOLVER.BASE_LR = 3.5e-4
    cfg.SOLVER.IMS_PER_BATCH = 64
    cfg.DATALOADER.NUM_INSTANCE = 4
    cfg.TPU.COMPUTE_DTYPE = "bfloat16" if on_tpu else "float32"
    cfg.TPU.USE_FLASH_ATTENTION = on_tpu
    # bf16 first-moment Adam state: +8 img/s measured; trajectory-tested
    # against fp32 state (tests/test_solver.py), off in config defaults.
    cfg.TPU.BF16_MOMENTS = on_tpu
    if not on_tpu:  # CPU smoke fallback so the script always works
        cfg.TPU.BACKBONE_DEPTH = 2
        cfg.TPU.BACKBONE_WIDTH = 64
        cfg.TPU.BACKBONE_HEADS = 2
        cfg.INPUT.SIZE_TRAIN = (64, 32)
        cfg.SOLVER.IMS_PER_BATCH = 16
    cfg.freeze()

    num_classes, camera_num = 171, 6  # RGBNT201
    batch_size = cfg.SOLVER.IMS_PER_BATCH
    h, w = cfg.INPUT.SIZE_TRAIN
    model = make_model(cfg, num_classes, camera_num)

    rng = jax.random.PRNGKey(0)
    import numpy as np

    images = np.asarray(
        jax.random.normal(rng, (batch_size, 3, h, w, 3), jnp.float32) * 0.5
    )
    pids = np.tile(np.arange(batch_size // 4), 4).astype(np.int32)[:batch_size]
    cams = (np.arange(batch_size) % camera_num).astype(np.int32)
    views = np.zeros((batch_size,), np.int32)
    sample = Batch(images=images, pids=pids, camids=cams, viewids=views,
                   paths=[], valid=batch_size)

    state, tx, center_tx, _ = create_train_state(
        cfg, model, rng, sample, steps_per_epoch=100
    )
    mesh = make_mesh(cfg.TPU.NUM_DEVICES)
    step = build_train_step(cfg, model, tx, center_tx, mesh, donate=True)

    im_d = jnp.asarray(images)
    pid_d = jnp.asarray(pids)
    cam_d = jnp.asarray(cams)
    view_d = jnp.asarray(views)

    # Warmup (compile + 2 steps).
    for _ in range(3):
        state, metrics = step(state, im_d, pid_d, cam_d, view_d, rng)
    jax.block_until_ready(metrics["loss"])

    iters = 20 if on_tpu else 5
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, im_d, pid_d, cam_d, view_d, rng)
    # Host readback of the last step's loss: every step is in the state
    # dependency chain, so this forces ALL iters to really execute (plain
    # block_until_ready can under-report on remote-execution backends).
    _ = float(metrics["loss"])
    dt = time.perf_counter() - t0

    n_dev = len(mesh.devices.flatten())
    samples_per_sec = batch_size * iters / dt
    per_chip = samples_per_sec / n_dev

    print(
        json.dumps(
            {
                "metric": "trimodal_train_images_per_sec_per_chip",
                "value": round(per_chip, 2),
                "unit": "img/s/chip",
                "vs_baseline": round(per_chip / BASELINE_SAMPLES_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
