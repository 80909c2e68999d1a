"""Piecewise timing of the flagship training step on the current backend.

Times backbone-only forward, full forward, loss forward, and the complete
train step, to show where the step budget goes.

Usage: python tools/profile_step.py [--batch 64]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def timeit(fn, *args, iters=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--no-flash", action="store_true")
    args = parser.parse_args()

    from demo2_tpu.config import get_cfg_defaults
    from demo2_tpu.data import Batch
    from demo2_tpu.engine import create_train_state
    from demo2_tpu.engine.train import build_train_step
    from demo2_tpu.models import make_model
    from demo2_tpu.models.pife import PIFE
    from demo2_tpu.parallel import make_mesh

    on_tpu = jax.default_backend() in ("tpu", "axon")
    cfg = get_cfg_defaults()
    cfg.MODEL.TRANSFORMER_TYPE = "ViT-B-16"
    cfg.MODEL.USE_SDTPS = True
    cfg.MODEL.USE_DGAF = True
    cfg.MODEL.ID_LOSS_WEIGHT = 0.25
    cfg.SOLVER.OPTIMIZER_NAME = "Adam"
    cfg.SOLVER.IMS_PER_BATCH = args.batch
    cfg.TPU.COMPUTE_DTYPE = "bfloat16" if on_tpu else "float32"
    cfg.TPU.USE_FLASH_ATTENTION = on_tpu and not args.no_flash
    cfg.freeze()

    b = args.batch
    h, w = cfg.INPUT.SIZE_TRAIN
    model = make_model(cfg, 171, 6)
    rng = jax.random.PRNGKey(0)
    images = jax.random.normal(rng, (b, 3, h, w, 3), jnp.float32) * 0.5
    pids = jnp.asarray(np.tile(np.arange(b // 4), 4)[:b], jnp.int32)
    cams = jnp.asarray(np.arange(b) % 6, jnp.int32)
    views = jnp.zeros((b,), jnp.int32)
    sample = Batch(np.asarray(images), np.asarray(pids), np.asarray(cams),
                   np.asarray(views), [], b)
    state, tx, ctx, _ = create_train_state(cfg, model, rng, sample, 100)

    # 1) full forward (embedding).
    fwd = jax.jit(
        lambda p, bs, im, cm: model.apply(
            {"params": p, "batch_stats": bs}, im, cm, train=False
        )["embedding"]
    )
    t_fwd = timeit(fwd, state.params, state.batch_stats, images, cams)
    print(f"forward(embedding):  {t_fwd:8.2f} ms  ({b / t_fwd * 1e3:7.1f} img/s)")

    # 2) train step.
    step = build_train_step(cfg, model, tx, ctx, mesh=make_mesh(-1), donate=False)
    t_step = timeit(
        lambda s: step(s, images, pids, cams, views, rng)[1]["loss"], state, iters=15
    )
    print(f"train step:          {t_step:8.2f} ms  ({b / t_step * 1e3:7.1f} img/s)")

    # 3) backbone-only forward for attribution.
    pife = PIFE(
        transformer_type=cfg.MODEL.TRANSFORMER_TYPE,
        img_size=tuple(cfg.INPUT.SIZE_TRAIN),
        camera_num=6,
        dtype=jnp.bfloat16 if on_tpu else jnp.float32,
        attn_implementation="pallas" if cfg.TPU.USE_FLASH_ATTENTION else "xla",
    )
    pv = jax.jit(lambda: pife.init({"params": rng}, images, cams))()
    bb = jax.jit(lambda v, im, cm: pife.apply(v, im, cm)[1])
    t_bb = timeit(bb, pv, images, cams)
    print(f"backbone fwd:        {t_bb:8.2f} ms  ({b / t_bb * 1e3:7.1f} img/s)")
    print(f"fusion+heads fwd:    {t_fwd - t_bb:8.2f} ms (by difference)")


if __name__ == "__main__":
    main()
