"""Benchmark: END-TO-END tri-modal training throughput on the flagship config.

Measures images/sec/chip around the REAL input pipeline — on-disk JPEGs
(RGBNT201-layout synthetic dataset at real scale, 3,933 tri-modal train
samples), decoded ONCE into the HBM-resident uint8 cache (persisted
host-side across invocations, demo2_tpu/data/device_cache.py), with the
random augmentations (flip/pad-crop/normalize/pixel-erase) running in-graph
and a (B,) int32 index feed per step.  This is the production input path;
the host-decode-per-epoch path caps at ~108 samples/s on this 1-core host
(tools/bench_loader.py) and is benched in docs/PERF.md.

Timed region: epochs 2..N of the real train loop (sampler order + jitted
step dispatch), i.e. steady state; the one-time decode cost and epoch-1
(compile) are reported on stderr.  Reference anchor: ~203.9 samples/s on a
single CUDA GPU measured around its torch DataLoader
(engine/processor.py:56; logs/RGBNT201_ablation_SDTPS_DGAF_20251207_115040/
SDTPS_DGAFv3.log).

Hang tolerance (VERDICT r4 #1, the third-strike fix): the remote-tunnel TPU
backend can STALL inside any RPC (init, transfer, compile, execute) without
raising — round 4's driver bench died exactly this way (rc=124, no record).
The measurement now runs in a SUPERVISED CHILD process:

  * the child writes a heartbeat file at every stage boundary, each carrying
    an explicit per-stage deadline (compile gets minutes, a steady epoch
    does not);
  * the parent watchdog kills the child when a heartbeat deadline or the
    total budget (--total-secs) lapses and emits a parseable record;
  * after EVERY timed epoch the child records a provisional throughput,
    which the parent prints immediately as a JSON line — so even a SIGKILL
    of the whole tree leaves the last stdout line parseable;
  * the parent converts SIGTERM (driver timeout) into "emit best-known
    record, then exit" instead of dying silently.

Outage tolerance (VERDICT r3 #1): before the first in-process backend
touch, availability is probed in bounded SUBPROCESS attempts with backoff;
on failure the script prints {"value": null, "skipped":
"tpu-pool-unavailable"} and exits 0.

Modes: --mode train (default, the driver metric) and --mode infer
(batch-1 latency + batch-64 throughput on the flagship model's eval path,
reference engine/processor.py:193-244), both under the same watchdog.

Multi-chip: ``--devices N`` runs the SAME e2e loop on an N-device
`jax.sharding.Mesh` (weak scaling; per-chip batch fixed) and reports
img/s/chip; ``--scaling`` adds a 1-chip run + scaling efficiency.

The last stdout line is always ONE parseable JSON record:
{"metric", "value", "unit", "vs_baseline", ...}.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import threading
import time

BASELINE_SAMPLES_PER_SEC = 203.9
METRIC_TRAIN = "e2e_train_images_per_sec_per_chip"
METRIC_INFER = "infer_images_per_sec"


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def emit(value, extra=None, vs_baseline=None, metric=METRIC_TRAIN,
         unit="img/s/chip"):
    rec = {
        "metric": metric,
        "value": value,
        "unit": unit,
        "vs_baseline": vs_baseline,
    }
    if extra:
        rec.update(extra)
    print(json.dumps(rec), flush=True)


def emit_skip(reason: str, extra=None, metric=METRIC_TRAIN) -> int:
    """Parseable failure record + rc=0 so the driver scores a marker."""
    e = dict(extra or {})
    e["skipped"] = reason
    emit(None, extra=e, metric=metric)
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


# ---------------------------------------------------------------------------
# Child side: reporter (heartbeat + record files) + fault injection
# ---------------------------------------------------------------------------


class Reporter:
    """Child-side progress channel the parent watchdog supervises.

    ``stage`` atomically rewrites the heartbeat file with an explicit
    deadline for the stage being ENTERED; ``record`` appends a JSONL record
    (provisional / final / skip) that the parent relays to stdout.
    """

    def __init__(self, hb_path, res_path):
        self.hb_path = hb_path
        self.res_path = res_path
        self.t0 = time.monotonic()

    def stage(self, name: str, deadline: float) -> None:
        _maybe_fault(name, self)
        log(f"[stage +{time.monotonic() - self.t0:.1f}s] {name} "
            f"(deadline {deadline:.0f}s)")
        if not self.hb_path:
            return
        tmp = f"{self.hb_path}.tmp"
        with open(tmp, "w") as f:
            json.dump({"t": time.time(), "stage": name, "deadline": deadline}, f)
        os.replace(tmp, self.hb_path)

    def record(self, kind: str, payload: dict) -> None:
        rec = {"kind": kind, **payload}
        if not self.res_path:
            # In-process mode (--no-watchdog): honor the stdout contract
            # directly — the last line must still be ONE parseable record.
            meta = {"provisional": True} if kind == "provisional" else None
            if kind == "skip":
                emit_skip(rec.get("reason", "unknown"))
            else:
                _emit_from_record(rec, meta)
            return
        with open(self.res_path, "a") as f:
            f.write(json.dumps(rec) + "\n")


def _maybe_fault(point: str, reporter) -> None:
    """Test hook: DEMO2_BENCH_FAULT={hang,crash}:<stage> injects a failure
    when the named stage is entered (tests/test_bench_cli.py)."""
    fault = os.environ.get("DEMO2_BENCH_FAULT", "")
    mode, _, at = fault.partition(":")
    if at != point:
        return
    if mode.endswith("once"):  # fire on the first attempt only (retry tests)
        marker = (reporter.hb_path or "/tmp/d2t_bench_fault") + ".fault_once"
        if os.path.exists(marker):
            return
        open(marker, "w").close()
        mode = mode[: -len("once")]
    if mode == "hang":
        # Declare a short deadline, then stall like a wedged RPC would.
        dl = float(os.environ.get("DEMO2_BENCH_FAULT_DEADLINE", 2.0))
        if reporter.hb_path:
            with open(reporter.hb_path, "w") as f:
                json.dump({"t": time.time(), "stage": point, "deadline": dl}, f)
        log(f"[fault] hanging at {point}")
        time.sleep(3600)
    elif mode == "crash":
        raise RuntimeError(f"injected crash at {point}")


# ---------------------------------------------------------------------------
# Measurement (runs in the child)
# ---------------------------------------------------------------------------


def measure(cfg, epochs, chunk, n_dev_req, rep: Reporter):
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

    rep.stage("dataloader", 180)
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
    # First device touches (param init + transfers) — a wedged tunnel stalls
    # here without raising, so it gets its own watchdog stage (round 4's
    # driver bench died between "dataset ready" and the decode log line).
    # 600 s: a COLD remote compile of the init fn takes minutes; measured
    # 2026-08-20 it exceeded 420 s once while concurrent CPU JAX processes
    # were alive (the axon tunnel serializes clients).
    rep.stage("train-state-init", 600)
    state, tx, center_tx, _ = create_train_state(
        cfg, model, rng, sample, steps_per_epoch=100
    )

    rep.stage("decode-cache", 420)
    cache = build_device_cache(train_pipe, mesh, train=True)
    log(f"decode-once: {len(train_pipe.samples)} tri-modal samples in "
        f"{cache.decode_seconds:.1f}s "
        f"({len(train_pipe.samples) / max(cache.decode_seconds, 1e-9):.0f} "
        f"samples/s, persisted host-side after the first run)")

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
        # Epoch 1 pays the jit compile (minutes cold over the tunnel,
        # seconds with a warm .jax_cache); later epochs are steady-state.
        rep.stage(f"epoch{epoch}", 600 if epoch == 1 else 240)
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
            rep.record("provisional", {
                "value": round(n_samples_timed / t_timed / n_dev, 2),
                "devices": n_dev, "epochs_timed": epoch - 1, "loss": loss,
            })
        rep.stage(f"epoch{epoch}-done", 240)

    if n_samples_timed == 0:
        raise RuntimeError(
            f"no timed samples: epochs={epochs} K={K} batch={batch_size} — "
            "increase --epochs or lower --chunk"
        )
    return n_samples_timed / t_timed / n_dev, n_dev, loss


def measure_infer(cfg, rep: Reporter):
    """Flagship eval-path latency/throughput (VERDICT r4 #7).

    Batch-1 latency and batch-64 throughput of the jitted embedding forward
    (the loop body of do_inference; reference engine/processor.py:193-244,
    feature extract per batch at :223-232).
    """
    import jax
    import jax.numpy as jnp

    from demo2_tpu.models import make_model

    rep.stage("infer-init", 420)
    num_classes, camera_num = 171, 6
    model = make_model(cfg, num_classes, camera_num)
    h, w = cfg.INPUT.SIZE_TEST
    rng = jax.random.PRNGKey(0)
    init_imgs = jnp.zeros((1, 3, h, w, 3), jnp.float32)
    variables = jax.jit(
        lambda: model.init({"params": rng}, init_imgs,
                           jnp.zeros((1,), jnp.int32), train=False)
    )()

    @jax.jit
    def fwd(variables, images, cams):
        # variables as an ARGUMENT: closing over them would inline 91M
        # params as HLO constants (the remote compile service rejects the
        # resulting payload with HTTP 413).
        return model.apply(variables, images, cams, train=False)["embedding"]

    results = {}
    for bs, iters in ((1, 100), (64, 40)):
        imgs = jax.random.normal(rng, (bs, 3, h, w, 3), jnp.float32) * 0.1
        cams = jnp.zeros((bs,), jnp.int32)
        rep.stage(f"infer-compile-b{bs}", 600)
        jax.block_until_ready(fwd(variables, imgs, cams))  # compile
        jax.block_until_ready(fwd(variables, imgs, cams))  # warm
        rep.stage(f"infer-timed-b{bs}", 240)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fwd(variables, imgs, cams)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        results[bs] = (dt / iters, bs * iters / dt)
        log(f"[infer] batch {bs}: {dt / iters * 1e3:.2f} ms/iter = "
            f"{bs * iters / dt:.1f} img/s")
        rep.record("provisional", {
            "value": round(results[bs][1], 2),
            "batch": bs, "metric": METRIC_INFER, "unit": "img/s",
        })
    return results


# ---------------------------------------------------------------------------
# Config assembly (runs in the child)
# ---------------------------------------------------------------------------


def configure(on_tpu, n_dev, overrides, epochs_arg, rep=None):
    """Build the flagship bench config (per-chip batch fixed = weak scaling)."""
    from demo2_tpu.config import get_cfg_defaults
    from demo2_tpu.config.presets import apply_flagship, apply_tiny
    from tools.make_synthetic_jpegs import generate

    if rep is not None:
        rep.stage("dataset-gen", 300)
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
    from demo2_tpu.config.presets import apply_overrides

    apply_overrides(cfg, overrides, log=log)
    cfg.freeze()
    return cfg, root, epochs


# ---------------------------------------------------------------------------
# Child main
# ---------------------------------------------------------------------------


def child_main(args) -> int:
    rep = Reporter(args.hb_file, args.result_file)
    rep.stage("jax-import", 240)
    _maybe_fault("pre-measure", rep)

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

        if args.mode == "infer":
            # cfg only (no dataset): measure_infer benchmarks the jitted
            # eval forward on device arrays — generating/validating the
            # 3,933-sample JPEG set here was a pure cold-start tax.
            from demo2_tpu.config import get_cfg_defaults
            from demo2_tpu.config.presets import apply_flagship, apply_overrides

            from demo2_tpu.config.presets import apply_tiny

            rep.stage("infer-config", 120)
            cfg = get_cfg_defaults()
            apply_flagship(cfg, on_tpu)
            if not on_tpu:  # CPU smoke keeps the tiny shrink
                apply_tiny(cfg)
            apply_overrides(cfg, args.set, log=log)
            cfg.freeze()
            res = measure_infer(cfg, rep)
            rep.record("final", {
                "metric": METRIC_INFER, "unit": "img/s",
                "value": round(res[64][1], 2),
                "extra": {"batch1_ms": round(res[1][0] * 1e3, 3),
                          "batch64_imgs_per_sec": round(res[64][1], 2)},
                "vs_baseline": None,
            })
            return 0

        runs = [1, n_dev_req] if (args.scaling and n_dev_req > 1) else [n_dev_req]
        per_chip = {}
        for n in runs:
            cfg, _root, epochs = configure(on_tpu, n, args.set, args.epochs, rep)
            per_chip[n], n_dev, loss = measure(cfg, epochs, args.chunk, n, rep)
    except Exception as e:  # noqa: BLE001 — classify, don't mask real bugs
        if _is_unavailable(e):
            log(f"TPU became unavailable mid-run: {type(e).__name__}: {e}")
            rep.record("skip", {"reason": "tpu-pool-unavailable"})
            return 0
        raise

    value = per_chip[runs[-1]]
    extra = {"devices": n_dev}
    if len(runs) == 2:
        extra["per_chip_1dev"] = round(per_chip[1], 2)
        extra["scaling_efficiency"] = round(per_chip[runs[-1]] / per_chip[1], 3)
    rep.record("final", {
        "metric": METRIC_TRAIN, "unit": "img/s/chip",
        "value": round(value, 2), "extra": extra,
        "vs_baseline": round(value / BASELINE_SAMPLES_PER_SEC, 3),
    })
    return 0


# ---------------------------------------------------------------------------
# Parent: watchdog supervisor
# ---------------------------------------------------------------------------


def _read_heartbeat(path):
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def _read_records(path, offset):
    """Read complete new JSONL records from ``path`` starting at ``offset``."""
    recs = []
    try:
        with open(path) as f:
            f.seek(offset)
            chunk = f.read()
    except OSError:
        return recs, offset
    consumed = 0
    for line in chunk.splitlines(keepends=True):
        if not line.endswith("\n"):
            break  # partial write; retry next poll
        consumed += len(line)
        try:
            recs.append(json.loads(line))
        except ValueError:
            pass
    return recs, offset + consumed


def _emit_from_record(rec, provisional_meta=None, metric=METRIC_TRAIN):
    """Print a JSON result line from a child record."""
    extra = dict(rec.get("extra") or {})
    for k, v in rec.items():
        if k not in ("kind", "value", "vs_baseline", "metric", "unit", "extra"):
            extra[k] = v
    if provisional_meta:
        extra.update(provisional_meta)
    vsb = rec.get("vs_baseline")
    m = rec.get("metric", metric)
    if vsb is None and rec.get("value") and m == METRIC_TRAIN:
        vsb = round(rec["value"] / BASELINE_SAMPLES_PER_SEC, 3)
    emit(rec.get("value"), extra=extra, vs_baseline=vsb, metric=m,
         unit=rec.get("unit", "img/s/chip"))


def supervise(args) -> int:
    """Run the measurement child under a heartbeat watchdog; always emit."""
    import tempfile

    workdir = tempfile.mkdtemp(prefix="d2t_bench_")
    hb_path = os.path.join(workdir, "heartbeat.json")
    res_path = os.path.join(workdir, "records.jsonl")
    open(res_path, "w").close()

    child_cmd = [sys.executable, os.path.abspath(__file__), "--child",
                 "--hb-file", hb_path, "--result-file", res_path,
                 "--mode", args.mode, "--platform", args.platform,
                 "--epochs", str(args.epochs), "--chunk", str(args.chunk),
                 "--devices", str(args.devices)]
    if args.scaling:
        child_cmd.append("--scaling")
    for ov in args.set:
        child_cmd += ["--set", ov]

    stop = threading.Event()
    term_reason = []

    def on_term(signum, frame):
        term_reason.append(f"signal-{signum}")
        stop.set()

    old_term = signal.signal(signal.SIGTERM, on_term)
    old_int = signal.signal(signal.SIGINT, on_term)

    # Child stdout is routed to our stderr: OUR stdout carries only the
    # parseable records the driver scores.
    start = time.monotonic()
    offset = 0
    last = {"provisional": None, "final": None, "skip": None, "stage": "spawn"}
    kill_reason = None
    child = None
    max_attempts = 2  # one retry for PRE-measurement infra blips (the
    # 2026-08-20 tunnel degradation stalled create_train_state twice, then
    # recovered — a fresh child minutes later succeeded at full speed)
    try:
        for attempt in range(1, max_attempts + 1):
            if os.path.exists(hb_path):
                os.unlink(hb_path)  # stale heartbeat from a killed attempt
            kill_reason = None
            attempt_start = time.monotonic()
            child = subprocess.Popen(child_cmd, stdout=sys.stderr,
                                     stderr=sys.stderr)
            while True:
                recs, offset = _read_records(res_path, offset)
                for rec in recs:
                    last[rec.get("kind", "?")] = rec
                    if rec.get("kind") == "provisional":
                        _emit_from_record(rec, {"provisional": True})
                rc = child.poll()
                if rc is not None:
                    break
                hb = _read_heartbeat(hb_path)
                if hb:
                    last["stage"] = hb.get("stage", "?")
                    if time.time() > hb["t"] + hb.get("deadline", 240):
                        kill_reason = f"stage-stall:{last['stage']}"
                elif time.monotonic() - attempt_start > 240:
                    kill_reason = "no-heartbeat"
                if time.monotonic() - start > args.total_secs:
                    kill_reason = "total-budget"
                if stop.is_set():
                    kill_reason = (
                        f"terminated:{term_reason[0] if term_reason else '?'}")
                if kill_reason:
                    log(f"watchdog: killing child ({kill_reason}) at stage "
                        f"{last['stage']}")
                    child.kill()
                    child.wait()
                    rc = None
                    break
                stop.wait(2.0)
            recs, offset = _read_records(res_path, offset)
            for rec in recs:
                last[rec.get("kind", "?")] = rec
                if rec.get("kind") == "provisional":
                    _emit_from_record(rec, {"provisional": True})
            done = (
                (rc == 0 and last["final"] is not None)
                or last["skip"] is not None
                or last["provisional"] is not None  # partial measurement —
                # report it rather than spend the budget re-measuring
                or stop.is_set()
                or kill_reason == "total-budget"
                or time.monotonic() - start > args.total_secs * 0.5
            )
            if done or attempt == max_attempts:
                break
            log(f"watchdog: retrying child (attempt {attempt + 1}/"
                f"{max_attempts}) after pre-measurement failure "
                f"({kill_reason or f'rc={rc}'})")
    finally:
        signal.signal(signal.SIGTERM, old_term)
        signal.signal(signal.SIGINT, old_int)
        if child is not None and child.poll() is None:
            child.kill()
            child.wait()

    metric = METRIC_INFER if args.mode == "infer" else METRIC_TRAIN
    if last["final"] is not None and rc == 0:
        _emit_from_record(last["final"], metric=metric)
        return 0
    if last["skip"] is not None:
        return emit_skip(last["skip"].get("reason", "unknown"), metric=metric)
    # No clean final: fall back to the best provisional measurement.
    failure = (kill_reason or f"child-crashed rc={rc}")
    if last["provisional"] is not None:
        _emit_from_record(
            last["provisional"],
            {"provisional": True, "failure": failure, "stage": last["stage"]},
            metric=metric,
        )
        return 0
    # Distinct classification: a stall/kill reads as infrastructure
    # ("tpu-hang-midrun"), a child that EXITED nonzero is a crash — most
    # likely a code bug that must not masquerade as TPU trouble.
    reason = (f"tpu-hang-midrun:{failure}" if kill_reason
              else f"bench-{failure}")
    return emit_skip(reason, extra={"stage": last["stage"]}, metric=metric)


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--set", action="append", default=[], metavar="SEC.KEY=V",
                    help="config override for experiments, e.g. "
                         "--set TPU.INT8_MLP=dynamic (driver runs use none)")
    ap.add_argument("--mode", choices=("train", "infer"), default="train")
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
                    default=float(os.environ.get("DEMO2_BENCH_RETRY_SECS", 900)),
                    help="total budget waiting out a TPU-pool outage")
    ap.add_argument("--probe-timeout", type=float, default=300.0,
                    help="per-attempt cap on a hung backend claim")
    ap.add_argument("--total-secs", type=float,
                    default=float(os.environ.get("DEMO2_BENCH_TOTAL_SECS", 1500)),
                    help="hard wall-clock budget for the measurement child")
    ap.add_argument("--platform", choices=("auto", "cpu"), default="auto",
                    help="cpu = force the host backend in the child (the "
                         "environment's sitecustomize overrides JAX_PLATFORMS "
                         "env vars, so tests/CPU-mesh validation use this)")
    ap.add_argument("--no-watchdog", action="store_true",
                    help="run the measurement in-process (debugging)")
    ap.add_argument("--child", action="store_true", help=argparse.SUPPRESS)
    ap.add_argument("--hb-file", default="", help=argparse.SUPPRESS)
    ap.add_argument("--result-file", default="", help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.child or args.no_watchdog:
        return child_main(args)

    if args.platform == "auto":
        ok, platform = wait_for_backend(args.retry_secs, args.probe_timeout)
        if not ok:
            metric = METRIC_INFER if args.mode == "infer" else METRIC_TRAIN
            return emit_skip(platform, metric=metric)

    return supervise(args)


if __name__ == "__main__":
    sys.exit(main())
