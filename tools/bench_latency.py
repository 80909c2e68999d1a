"""Eval latency benchmark (batch 1 first: BASELINE.json configs[0] names
"RGBNT201 DeMo eval, batch 1" as a scored configuration; the reference path
is test_net.py:9-44 re-running the torch model per batch).

Two numbers per batch size:
  * device latency — L chained forwards in-graph (each iteration's input
    depends on the previous embedding, so XLA cannot parallelize or elide
    them), one readback; per-forward time is the deployment-relevant
    on-device latency.
  * single-dispatch wall time — one AOT-compiled call timed end-to-end from
    this host.  On this box it includes the ~140 ms remote-tunnel round trip
    (docs/PERF.md methodology); on a real TPU VM host it would be device
    latency + PCIe transfer.

Run (single process only!): python tools/bench_latency.py
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    from demo2_tpu.config import get_cfg_defaults
    from demo2_tpu.models import make_model

    on_tpu = jax.default_backend() in ("tpu", "axon")

    cfg = get_cfg_defaults()
    cfg.MODEL.TRANSFORMER_TYPE = "ViT-B-16"
    cfg.MODEL.USE_SDTPS = True
    cfg.MODEL.USE_DGAF = True
    cfg.MODEL.DGAF_VERSION = "v3"
    cfg.TPU.COMPUTE_DTYPE = "bfloat16" if on_tpu else "float32"
    cfg.TPU.USE_FLASH_ATTENTION = on_tpu
    if not on_tpu:  # CPU smoke
        cfg.TPU.BACKBONE_DEPTH = 2
        cfg.TPU.BACKBONE_WIDTH = 64
        cfg.TPU.BACKBONE_HEADS = 2
        cfg.INPUT.SIZE_TRAIN = (64, 32)
        cfg.INPUT.SIZE_TEST = (64, 32)
    cfg.freeze()

    num_classes, cam_num = 171, 4  # RGBNT201 shapes
    model = make_model(cfg, num_classes, cam_num)
    h, w = cfg.INPUT.SIZE_TEST
    rng = np.random.default_rng(0)

    results = {}
    for b in (1, 8, 64):
        imgs = jnp.asarray(rng.normal(size=(b, 3, h, w, 3)), jnp.float32)
        cams = jnp.zeros((b,), jnp.int32)
        mask = jnp.ones((3,), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), imgs, cams, train=False)

        def fwd(variables, x, cams, mask):
            out = model.apply(variables, x, cams, None, mask, train=False)[
                "embedding"
            ]
            return out / jnp.maximum(
                jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-12
            )

        # (a) chained device latency
        iters = 50 if on_tpu else 5

        @jax.jit
        def chain(variables, x, cams, mask):
            def body(i, x):
                emb = fwd(variables, x, cams, mask)
                return x + (jnp.sum(emb) * 1e-30).astype(x.dtype)

            x = jax.lax.fori_loop(0, iters, body, x)
            return fwd(variables, x, cams, mask)

        out = chain(variables, imgs, cams, mask)
        _ = np.asarray(out[:1, :1])
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            out = chain(variables, imgs, cams, mask)
            _ = np.asarray(out[:1, :1])
            best = min(best, time.perf_counter() - t0)
        dev_ms = best / (iters + 1) * 1e3

        # (b) single AOT dispatch wall time
        compiled = jax.jit(fwd).lower(variables, imgs, cams, mask).compile()
        out = compiled(variables, imgs, cams, mask)
        _ = np.asarray(out[:1, :1])
        best1 = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            out = compiled(variables, imgs, cams, mask)
            _ = np.asarray(out[:1, :1])
            best1 = min(best1, time.perf_counter() - t0)

        log(f"batch {b:3d}: device {dev_ms:7.2f} ms/forward "
            f"({b / dev_ms * 1e3:7.1f} img/s) | single dispatch "
            f"{best1 * 1e3:7.1f} ms (incl. host round trip)")
        results[b] = {"device_ms": round(dev_ms, 2),
                      "dispatch_ms": round(best1 * 1e3, 1)}

    print(json.dumps({"metric": "eval_latency", "unit": "ms",
                      "batches": results}))


if __name__ == "__main__":
    main()
