"""Benchmark: END-TO-END tri-modal training throughput on the flagship config.

Measures images/sec/chip around the REAL input pipeline — on-disk JPEGs
(RGBNT201-layout synthetic dataset at real scale, 3,933 tri-modal train
samples), decoded ONCE into the HBM-resident uint8 cache, with the random
augmentations (flip/pad-crop/normalize/pixel-erase) running in-graph and a
(B,) int32 index feed per step (demo2_tpu/data/device_cache.py).  This is
the production input path; the host-decode-per-epoch path caps at ~108
samples/s on this 1-core host (tools/bench_loader.py) and is benched in
docs/PERF.md.

Timed region: epochs 2..N of the real train loop (sampler order + jitted
step dispatch), i.e. steady state; the one-time decode cost and epoch-1
(compile) are reported on stderr.  Reference anchor: ~203.9 samples/s on a
single CUDA GPU measured around its torch DataLoader
(engine/processor.py:56; logs/RGBNT201_ablation_SDTPS_DGAF_20251207_115040/
SDTPS_DGAFv3.log).

Outage tolerance (VERDICT r3 #1): the TPU pool behind the remote tunnel can
go UNAVAILABLE (a single raw backend-init attempt then blocks ~25 min before
raising).  Before the first in-process backend touch, availability is probed
in bounded SUBPROCESS attempts (each killed after --probe-timeout) with
backoff until DEMO2_BENCH_RETRY_SECS is exhausted; on final failure — or an
UNAVAILABLE raised mid-run — the script prints a parseable skip record
  {"metric": ..., "value": null, ..., "skipped": "tpu-pool-unavailable"}
and exits 0, so the driver always records a line instead of a traceback.

Multi-chip (VERDICT r3 #2): ``--devices N`` runs the SAME e2e loop on an
N-device `jax.sharding.Mesh` (weak scaling: per-chip batch fixed, global
batch B*N) and reports img/s/chip; ``--scaling`` measures 1 chip then N
chips in one run and adds the scaling efficiency.  The dispatch mechanics
are validated on the 8-device virtual CPU mesh (tests/test_bench_cli.py);
the reference's equivalent is NCCL DDP (train_net.py:72-73,
data/datasets/sampler_ddp.py:117-201).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

BASELINE_SAMPLES_PER_SEC = 203.9
METRIC = "e2e_train_images_per_sec_per_chip"


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def emit(value, extra=None, vs_baseline=None):
    rec = {
        "metric": METRIC,
        "value": value,
        "unit": "img/s/chip",
        "vs_baseline": vs_baseline,
    }
    if extra:
        rec.update(extra)
    print(json.dumps(rec), flush=True)


def emit_skip(reason: str) -> int:
    """Parseable failure record + rc=0 so the driver scores a marker."""
    emit(None, extra={"skipped": reason})
    return 0


def wait_for_backend(budget_secs: float, attempt_timeout: float):
    """Probe backend availability in subprocesses until it claims or budget ends.

    Each probe is a fresh process (a failed in-process init is cached by JAX
    and would poison every retry); a hung claim is killed at
    ``attempt_timeout`` instead of blocking the ~25 min the plugin takes to
    give up on its own.  Returns (ok, platform_or_reason).
    """
    deadline = time.monotonic() + budget_secs
    attempt = 0
    code = "import jax; print(jax.devices()[0].platform)"
    while True:
        attempt += 1
        remaining = deadline - time.monotonic()
        if remaining <= 0 and attempt > 1:
            return False, "tpu-pool-unavailable"
        t0 = time.monotonic()
        try:
            out = subprocess.run(
                [sys.executable, "-c", code],
                capture_output=True, text=True,
                timeout=max(30.0, min(attempt_timeout, max(remaining, 30.0))),
            )
        except subprocess.TimeoutExpired:
            log(f"backend probe {attempt}: killed after "
                f"{time.monotonic() - t0:.0f}s (claim hung)")
            out = None
        if out is not None and out.returncode == 0:
            platform = out.stdout.strip().splitlines()[-1]
            log(f"backend probe {attempt}: OK ({platform}) in "
                f"{time.monotonic() - t0:.1f}s")
            return True, platform
        if out is not None:
            tail = (out.stderr or "").strip().splitlines()[-1:]
            log(f"backend probe {attempt}: rc={out.returncode} "
                f"after {time.monotonic() - t0:.0f}s {tail}")
        if time.monotonic() >= deadline:
            return False, "tpu-pool-unavailable"
        time.sleep(min(30.0, max(5.0, deadline - time.monotonic())))


def _is_unavailable(exc: BaseException) -> bool:
    msg = f"{type(exc).__name__}: {exc}"
    return "UNAVAILABLE" in msg or "Unable to initialize backend" in msg


def measure(cfg, epochs, chunk, n_dev_req):
    """Run the e2e loop once; returns (img/s/chip, n_devices, loss)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from demo2_tpu.data import make_dataloader
    from demo2_tpu.data.device_cache import build_device_cache
    from demo2_tpu.engine import create_train_state
    from demo2_tpu.engine.train import build_train_step
    from demo2_tpu.models import make_model
    from demo2_tpu.parallel import make_mesh

    train_pipe, sampler, val_pipe, nq, num_classes, cam_num, view_num = (
        make_dataloader(cfg)
    )
    batch_size = cfg.SOLVER.IMS_PER_BATCH
    model = make_model(cfg, num_classes, cam_num, view_num)
    mesh = make_mesh(n_dev_req)
    n_dev = len(mesh.devices.flatten())
    if n_dev_req > 0 and n_dev != n_dev_req:
        log(f"WARNING: requested {n_dev_req} devices, only {n_dev} attached "
            "— reporting per-chip over the actual mesh")

    rng = jax.random.PRNGKey(0)
    sample = next(train_pipe.iter_batches(sampler.epoch_indices(0), seed=0))
    state, tx, center_tx, _ = create_train_state(
        cfg, model, rng, sample, steps_per_epoch=100
    )

    cache = build_device_cache(train_pipe, mesh, train=True)
    log(f"decode-once: {len(train_pipe.samples)} tri-modal samples in "
        f"{cache.decode_seconds:.1f}s "
        f"({len(train_pipe.samples) / max(cache.decode_seconds, 1e-9):.0f} "
        f"samples/s, paid once per run)")

    # Chunked dispatch (as in do_train's device-cache path): K optimizer
    # steps per dispatch via lax.scan — one (K, B) index transfer per chunk,
    # one readback per epoch.  Epoch tails (< K steps) are dropped from the
    # benchmark loop only (do_train runs them via tail executables).
    # Default K: at most half an epoch so the PK sampler's per-epoch length
    # jitter (drop-last) can never leave an epoch with zero full chunks.
    steps_per_epoch = max(1, len(sampler.epoch_indices(1)) // batch_size)
    K = chunk if chunk > 0 else max(1, min(10, steps_per_epoch // 2))
    step_k = build_train_step(cfg, model, tx, center_tx, mesh, donate=True,
                              scan_steps=K, device_cache=cache)

    n_samples_timed = 0
    t_timed = 0.0
    metrics = None
    loss = float("nan")
    for epoch in range(1, epochs + 1):
        order = sampler.epoch_indices(epoch)
        full = len(order) // batch_size // K
        idx_all = np.asarray(order[: full * K * batch_size], np.int32).reshape(
            full, K, batch_size
        )
        t0 = time.perf_counter()
        for c in range(full):
            state, metrics = step_k(
                state, cache.images, cache.pids, cache.camids, cache.viewids,
                jnp.asarray(idx_all[c]), rng,
            )
        # Force the full epoch chain to execute before stopping the clock.
        loss = float(metrics["loss"])
        dt = time.perf_counter() - t0
        n = full * K * batch_size
        log(f"[{n_dev}dev] epoch {epoch}: {n} samples in {dt:.2f}s = "
            f"{n / dt:.1f} img/s (loss {loss:.3f})")
        if epoch >= 2:  # epoch 1 pays compile
            n_samples_timed += n
            t_timed += dt

    if n_samples_timed == 0:
        raise RuntimeError(
            f"no timed samples: epochs={epochs} K={K} batch={batch_size} — "
            "increase --epochs or lower --chunk"
        )
    return n_samples_timed / t_timed / n_dev, n_dev, loss


def configure(on_tpu, n_dev, overrides, epochs_arg):
    """Build the flagship bench config (per-chip batch fixed = weak scaling)."""
    from demo2_tpu.config import get_cfg_defaults
    from demo2_tpu.config.presets import apply_flagship, apply_tiny
    from tools.make_synthetic_jpegs import generate

    cfg = get_cfg_defaults()
    apply_flagship(cfg, on_tpu)
    cfg.SOLVER.IMS_PER_BATCH = 64 * n_dev
    if on_tpu:
        t0 = time.perf_counter()
        # PK batches need IMS_PER_BATCH/NUM_INSTANCE = 8N distinct ids; the
        # RGBNT201-scale set (171 ids) covers N <= 21 — scale the id pool
        # (same imgs/id) for larger meshes so weak scaling stays honest.
        pids_needed = 8 * n_dev * 2
        if pids_needed <= 171:
            root = "/tmp/d2t_synth"
            generate(root)  # idempotent; ~85 s cold
        else:
            root = f"/tmp/d2t_synth_p{pids_needed}"
            generate(root, num_pids=pids_needed)
        log(f"dataset ready in {time.perf_counter() - t0:.1f}s")
        epochs = 4
    else:  # CPU smoke fallback so the script always works
        apply_tiny(cfg)
        cfg.SOLVER.IMS_PER_BATCH = 8 * n_dev
        # Enough pids that the PK sampler fills the global batch at any N.
        pids = max(8, 8 * n_dev)
        root = f"/tmp/d2t_synth_smoke_p{pids}"
        generate(root, num_pids=pids, imgs_per_pid=8, test_pids=4,
                 test_imgs_per_pid=4, src_size=(72, 36))
        epochs = 3
    cfg.DATASETS.ROOT_DIR = root
    if epochs_arg:
        epochs = epochs_arg
    for ov in overrides:
        path, _, raw = ov.partition("=")
        sec, _, key = path.partition(".")
        node = getattr(cfg, sec)
        cur = getattr(node, key)
        if isinstance(cur, bool):
            val = raw.lower() in ("1", "true", "yes", "on")
        elif isinstance(cur, int):
            val = int(raw)
        elif isinstance(cur, float):
            val = float(raw)
        else:
            val = raw
        setattr(node, key, val)
        log(f"override: {sec}.{key} = {val!r}")
    cfg.freeze()
    return cfg, root, epochs


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--set", action="append", default=[], metavar="SEC.KEY=V",
                    help="config override for experiments, e.g. "
                         "--set TPU.INT8_MLP=dynamic (driver runs use none)")
    ap.add_argument("--epochs", type=int, default=0)
    ap.add_argument("--chunk", type=int, default=0,
                    help="steps per scan dispatch (default min(10, steps/epoch))")
    ap.add_argument("--devices", type=int, default=0,
                    help="mesh size for the scaling bench (0 = single chip; "
                         "per-chip batch fixed, global batch scales)")
    ap.add_argument("--scaling", action="store_true",
                    help="with --devices N: also measure 1 device and report "
                         "scaling efficiency")
    ap.add_argument("--retry-secs", type=float,
                    default=float(os.environ.get("DEMO2_BENCH_RETRY_SECS", 2100)),
                    help="total budget waiting out a TPU-pool outage")
    ap.add_argument("--probe-timeout", type=float, default=420.0,
                    help="per-attempt cap on a hung backend claim")
    ap.add_argument("--platform", choices=("auto", "cpu"), default="auto",
                    help="cpu = force the host backend in-process (the "
                         "environment's sitecustomize overrides JAX_PLATFORMS "
                         "env vars, so tests/CPU-mesh validation use this)")
    args = ap.parse_args()

    if args.platform == "auto":
        ok, platform = wait_for_backend(args.retry_secs, args.probe_timeout)
        if not ok:
            return emit_skip(platform)

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
        if args.devices > 1:
            jax.config.update("jax_num_cpu_devices", args.devices)

    from demo2_tpu.config.presets import setup_compilation_cache

    setup_compilation_cache()

    try:
        on_tpu = jax.default_backend() in ("tpu", "axon")
        avail = len(jax.devices())
        n_dev_req = max(1, args.devices)
        if n_dev_req > avail:
            log(f"WARNING: --devices {n_dev_req} > {avail} attached; "
                f"clamping (weak scaling needs the real chips)")
            n_dev_req = avail
        runs = [1, n_dev_req] if (args.scaling and n_dev_req > 1) else [n_dev_req]
        per_chip = {}
        loss = None
        for n in runs:
            cfg, _root, epochs = configure(on_tpu, n, args.set, args.epochs)
            per_chip[n], n_dev, loss = measure(cfg, epochs, args.chunk, n)
    except Exception as e:  # noqa: BLE001 — classify, don't mask real bugs
        if _is_unavailable(e):
            log(f"TPU became unavailable mid-run: {type(e).__name__}: {e}")
            return emit_skip("tpu-pool-unavailable")
        raise

    value = per_chip[runs[-1]]
    extra = {"devices": n_dev}
    if len(runs) == 2:
        extra["per_chip_1dev"] = round(per_chip[1], 2)
        extra["scaling_efficiency"] = round(per_chip[runs[-1]] / per_chip[1], 3)
    emit(round(value, 2), extra=extra,
         vs_baseline=round(value / BASELINE_SAMPLES_PER_SEC, 3))
    return 0


if __name__ == "__main__":
    sys.exit(main())
