"""jax.profiler trace attempt on the flagship train step (VERDICT r3 #5).

SURVEY §5 names jax.profiler the tracing plan of record; two rounds of
hardware windows closed before a capture happened.  This script makes the
attempt a one-command artifact:

  1. builds the flagship device-cache train step exactly as bench.py does,
  2. warms it (compile), then captures `jax.profiler.trace` around a few
     chunked dispatches into --log-dir (TensorBoard profile plugin format),
  3. reports WHAT was captured (xplane/trace file inventory + sizes) —
     over the remote axon tunnel the device plane may be absent; the host
     plane alone still shows dispatch gaps,
  4. always emits the cost_analysis()/memory_analysis() fallback table for
     the compiled step, so docs/PERF.md's breakdown can cite compiler
     numbers rather than wall-clock subtraction.

Usage: python tools/profile_trace.py [--log-dir logs/profile] [--chunks 3]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log-dir", default="logs/profile")
    ap.add_argument("--chunks", type=int, default=3)
    ap.add_argument("--chunk", type=int, default=10)
    ap.add_argument("--tiny", action="store_true", help="CPU mechanics smoke")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from demo2_tpu.config.presets import setup_compilation_cache

    setup_compilation_cache()
    if args.tiny:
        jax.config.update("jax_platforms", "cpu")

    import bench as bench_mod
    from demo2_tpu.data import make_dataloader
    from demo2_tpu.data.device_cache import build_device_cache
    from demo2_tpu.engine import create_train_state
    from demo2_tpu.engine.train import build_train_step
    from demo2_tpu.models import make_model
    from demo2_tpu.parallel import make_mesh

    on_tpu = jax.default_backend() in ("tpu", "axon")
    cfg, root, _ = bench_mod.configure(on_tpu and not args.tiny, 1, [], 0)

    train_pipe, sampler, *_rest = make_dataloader(cfg)
    num_classes, cam_num, view_num = _rest[2], _rest[3], _rest[4]
    model = make_model(cfg, num_classes, cam_num, view_num)
    mesh = make_mesh(1)
    rng = jax.random.PRNGKey(0)
    sample = next(train_pipe.iter_batches(sampler.epoch_indices(0), seed=0))
    state, tx, center_tx, _ = create_train_state(
        cfg, model, rng, sample, steps_per_epoch=100
    )
    cache = build_device_cache(train_pipe, mesh, train=True)

    bs = cfg.SOLVER.IMS_PER_BATCH
    K = args.chunk
    order = np.asarray(sampler.epoch_indices(1), np.int32)
    need = (args.chunks + 1) * K * bs
    if len(order) < need:  # tiny datasets: repeat the epoch order
        order = np.tile(order, -(-need // len(order)))
    idx_all = order[:need].reshape(-1, K, bs)
    step_k = build_train_step(cfg, model, tx, center_tx, mesh, donate=True,
                              scan_steps=K, device_cache=cache)

    # Warm-up dispatch: compile outside the trace window.
    t0 = time.perf_counter()
    state, metrics = step_k(state, cache.images, cache.pids, cache.camids,
                            cache.viewids, jnp.asarray(idx_all[0]), rng)
    _ = float(metrics["loss"])
    print(f"warm-up (compile) {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    report = {"backend": jax.default_backend(), "chunk": K,
              "chunks_traced": args.chunks}

    # --- the trace attempt -------------------------------------------------
    os.makedirs(args.log_dir, exist_ok=True)
    trace_err = None
    t0 = time.perf_counter()
    try:
        jax.profiler.start_trace(args.log_dir)
        try:
            for c in range(1, args.chunks + 1):
                state, metrics = step_k(
                    state, cache.images, cache.pids, cache.camids,
                    cache.viewids, jnp.asarray(idx_all[c]), rng,
                )
            _ = float(metrics["loss"])
        finally:
            jax.profiler.stop_trace()
    except Exception as e:  # noqa: BLE001 — the attempt itself is the data
        trace_err = f"{type(e).__name__}: {e}"
    report["trace_seconds"] = round(time.perf_counter() - t0, 2)
    report["trace_error"] = trace_err

    captured = sorted(
        glob.glob(osp.join(args.log_dir, "**", "*"), recursive=True)
    )
    report["trace_files"] = [
        {"path": osp.relpath(p, args.log_dir), "bytes": osp.getsize(p)}
        for p in captured if osp.isfile(p)
    ]
    report["has_xplane"] = any(p["path"].endswith(".xplane.pb")
                               for p in report["trace_files"])

    # --- cost/memory analysis fallback (always) ----------------------------
    lowered = step_k.lower(
        state, cache.images, cache.pids, cache.camids, cache.viewids,
        jnp.asarray(idx_all[0]), rng,
    )
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list) and cost:
        cost = cost[0]
    if isinstance(cost, dict):
        report["cost_analysis"] = {
            k: v for k, v in sorted(cost.items())
            if isinstance(v, (int, float)) and ("flops" in k or "bytes" in k
                                                or "optimal" in k)
        }
    else:
        # The remote axon backend returns None here (seen round 3:
        # "FLOP count unavailable") — try the pre-compile lowering's
        # estimate, which runs client-side.
        lcost = lowered.cost_analysis()
        if isinstance(lcost, list) and lcost:
            lcost = lcost[0]
        report["cost_analysis"] = (
            {k: v for k, v in sorted(lcost.items())
             if isinstance(v, (int, float))}
            if isinstance(lcost, dict) else "unavailable-on-backend"
        )
    try:
        mem = compiled.memory_analysis()
        report["memory_analysis"] = {
            a: getattr(mem, a)
            for a in ("argument_size_in_bytes", "output_size_in_bytes",
                      "temp_size_in_bytes", "generated_code_size_in_bytes")
            if hasattr(mem, a)
        }
    except Exception as e:  # noqa: BLE001
        report["memory_analysis"] = f"unavailable: {e}"

    out = "reports/profile_trace.json"
    os.makedirs("reports", exist_ok=True)
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))
    print(f"report -> {out}; trace dir -> {args.log_dir}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
