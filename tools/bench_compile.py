"""Compile-time measurement (VERDICT r2 item 8): trace/lower vs XLA-compile
seconds for the flagship train step and the eval forward, cold and warm.

Remote-compile note: on this box XLA compilation happens server-side through
the axon tunnel, so "compile" includes the HLO upload + remote compile +
executable download.  The persistent cache (.jax_cache) makes warm reloads
seconds; this tool reports both by clearing/keeping the in-process cache and
optionally bypassing the persistent cache (--cold).

Run (single process only!): python tools/bench_compile.py [--cold]
"""

from __future__ import annotations

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import time

import jax
import jax.numpy as jnp
import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cold", action="store_true",
                    help="bypass the persistent compilation cache")
    args = ap.parse_args()
    if not args.cold:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from demo2_tpu.config import get_cfg_defaults
    from demo2_tpu.data.datasets import SyntheticTriModal
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
    cfg.SOLVER.IMS_PER_BATCH = 64 if on_tpu else 8
    cfg.DATALOADER.NUM_INSTANCE = 8 if on_tpu else 2
    cfg.TPU.COMPUTE_DTYPE = "bfloat16" if on_tpu else "float32"
    cfg.TPU.USE_FLASH_ATTENTION = on_tpu
    if not on_tpu:
        cfg.TPU.BACKBONE_DEPTH = 2
        cfg.TPU.BACKBONE_WIDTH = 64
        cfg.TPU.BACKBONE_HEADS = 2
        cfg.INPUT.SIZE_TRAIN = (64, 32)
        cfg.INPUT.SIZE_TEST = (64, 32)
    cfg.freeze()

    num_classes, cam_num = 171, 4
    b = cfg.SOLVER.IMS_PER_BATCH
    h, w = cfg.INPUT.SIZE_TRAIN
    model = make_model(cfg, num_classes, cam_num)
    mesh = make_mesh(cfg.TPU.NUM_DEVICES)
    rng = np.random.default_rng(0)

    class _B:  # minimal Batch stand-in for create_train_state
        images = np.asarray(rng.normal(size=(b, 3, h, w, 3)), np.float32)
        pids = np.arange(b, dtype=np.int32) % num_classes
        camids = np.zeros((b,), np.int32)
        viewids = np.zeros((b,), np.int32)

    t0 = time.perf_counter()
    state, tx, center_tx, _ = create_train_state(
        cfg, model, jax.random.PRNGKey(0), _B, steps_per_epoch=100
    )
    jax.block_until_ready(state.params)
    t_init = time.perf_counter() - t0
    log(f"model init (trace+compile+run of init fn): {t_init:.1f}s")

    step = build_train_step(cfg, model, tx, center_tx, mesh, donate=False)
    images = jnp.asarray(_B.images)
    pids = jnp.asarray(_B.pids)
    cams = jnp.asarray(_B.camids)
    views = jnp.asarray(_B.viewids)
    key = jax.random.PRNGKey(1)

    t0 = time.perf_counter()
    out = step(state, images, pids, cams, views, key)
    jax.block_until_ready(out[1]["loss"])
    t_first = time.perf_counter() - t0
    # Steady-state: call with the ORIGINAL state object so the arg structure
    # is bit-identical to the compiled signature (feeding the carried state
    # back can change weak-type/commitment metadata and silently recompile —
    # observed as a 41 s "steady" step on 2026-08-17).
    t0 = time.perf_counter()
    out2 = step(state, images, pids, cams, views, key)
    jax.block_until_ready(out2[1]["loss"])
    t_steady = time.perf_counter() - t0
    log(f"train step: first call (trace+compile) {t_first:.1f}s, "
        f"steady {t_steady * 1e3:.1f}ms")

    from demo2_tpu.engine.eval import build_eval_step

    eval_step = build_eval_step(cfg, model, mesh=None)
    t0 = time.perf_counter()
    feat = eval_step(state.params, state.batch_stats, images, cams, views,
                     None, 3)
    jax.block_until_ready(feat)
    t_eval = time.perf_counter() - t0
    log(f"eval step: first call (trace+compile) {t_eval:.1f}s")

    import json

    print(json.dumps({
        "metric": "compile_seconds",
        "persistent_cache": not args.cold,
        "init_s": round(t_init, 1),
        "train_step_first_s": round(t_first, 1),
        "train_step_steady_ms": round(t_steady * 1e3, 1),
        "eval_step_first_s": round(t_eval, 1),
    }))


if __name__ == "__main__":
    main()
