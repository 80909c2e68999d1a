"""bench.py driver contract: always ONE parseable JSON line, rc=0 on outage.

VERDICT r3 #1: BENCH_r03 crashed with rc=1 when the TPU pool went
UNAVAILABLE; the driver recorded a traceback instead of a number.  These
tests pin the skip record, the probe retry loop, and (slow lane) the
--devices N scaling mode on the virtual CPU mesh.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402


class _FakeResult:
    def __init__(self, rc, out="", err=""):
        self.returncode = rc
        self.stdout = out
        self.stderr = err


def test_wait_for_backend_success(monkeypatch):
    calls = []

    def fake_run(cmd, **kw):
        calls.append(cmd)
        return _FakeResult(0, out="axon\n")

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    ok, platform = bench.wait_for_backend(60, 10)
    assert ok and platform == "axon"
    assert len(calls) == 1


def test_wait_for_backend_retries_then_gives_up(monkeypatch):
    calls = []

    def fake_run(cmd, **kw):
        calls.append(kw.get("timeout"))
        raise subprocess.TimeoutExpired(cmd, kw.get("timeout"))

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    ok, reason = bench.wait_for_backend(0.0, 10)
    assert not ok and reason == "tpu-pool-unavailable"
    assert len(calls) >= 1  # the first attempt always runs


def test_wait_for_backend_recovers_mid_outage(monkeypatch):
    """Pool down for two probes, then up — the bench must proceed."""
    state = {"n": 0}
    t = {"now": 0.0}

    def fake_run(cmd, **kw):
        state["n"] += 1
        if state["n"] < 3:
            return _FakeResult(1, err="UNAVAILABLE: TPU backend setup error")
        return _FakeResult(0, out="WARNING: noise\naxon\n")

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "sleep", lambda s: t.__setitem__("now", t["now"] + s))
    monkeypatch.setattr(bench.time, "monotonic", lambda: t["now"])
    ok, platform = bench.wait_for_backend(600, 10)
    assert ok and platform == "axon" and state["n"] == 3


def test_emit_skip_is_parseable(capsys):
    rc = bench.emit_skip("tpu-pool-unavailable")
    assert rc == 0
    line = capsys.readouterr().out.strip()
    rec = json.loads(line)
    assert rec["metric"] == "e2e_train_images_per_sec_per_chip"
    assert rec["value"] is None
    assert rec["vs_baseline"] is None
    assert rec["skipped"] == "tpu-pool-unavailable"


def test_unavailable_classifier():
    assert bench._is_unavailable(
        RuntimeError("Unable to initialize backend 'axon': UNAVAILABLE: ...")
    )
    assert bench._is_unavailable(Exception("UNAVAILABLE: TPU backend setup"))
    assert not bench._is_unavailable(ValueError("shape mismatch"))


def test_main_skips_with_rc0_when_pool_down(monkeypatch, capsys):
    monkeypatch.setattr(
        bench, "wait_for_backend", lambda *a: (False, "tpu-pool-unavailable")
    )
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    assert bench.main() == 0
    rec = json.loads(capsys.readouterr().out.strip())
    assert rec["value"] is None and rec["skipped"] == "tpu-pool-unavailable"


def _run_cli(extra_args=(), fault=None, timeout=120, send_term_after=None,
             fault_deadline=None):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    if fault:
        env["DEMO2_BENCH_FAULT"] = fault
    if fault_deadline is not None:
        env["DEMO2_BENCH_FAULT_DEADLINE"] = str(fault_deadline)
    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "bench.py"), "--platform", "cpu",
         *extra_args],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, cwd=REPO,
        env=env,
    )
    if send_term_after is not None:
        import time
        time.sleep(send_term_after)
        proc.send_signal(subprocess.signal.SIGTERM)
    out, err = proc.communicate(timeout=timeout)
    return proc.returncode, out, err


def _last_record(out: str) -> dict:
    lines = [l for l in out.strip().splitlines() if l.strip()]
    return json.loads(lines[-1])


def test_hang_before_measure_emits_skip_record():
    """A wedged RPC before any measurement (the round-4 driver failure
    mode): the watchdog must kill the child, retry ONCE (infra blips
    recover), and emit a parseable skip when both attempts stall."""
    rc, out, err = _run_cli(fault="hang:jax-import")
    assert rc == 0, err[-2000:]
    rec = _last_record(out)
    assert rec["value"] is None
    assert "stage-stall" in rec["skipped"]
    assert rec["stage"] == "jax-import"
    assert err.count("[fault] hanging") == 2  # both attempts ran
    assert "retrying child (attempt 2/2)" in err


@pytest.mark.slow
def test_pre_measure_hang_recovers_on_retry():
    """A transient stall on attempt 1 must not cost the measurement: the
    retry child runs clean and the final record carries a real value."""
    rc, out, err = _run_cli(fault="hangonce:train-state-init", timeout=900)
    assert rc == 0, err[-2000:]
    rec = _last_record(out)
    assert rec["value"] and rec["value"] > 0
    assert "provisional" not in rec
    assert "retrying child (attempt 2/2)" in err


def test_total_budget_kill_emits_skip_record():
    """Heartbeats flowing but the total wall budget lapsing still yields a
    parseable record (driver timeouts must never land on a traceback)."""
    rc, out, err = _run_cli(extra_args=("--total-secs", "3"),
                            fault="hang:jax-import", fault_deadline=600)
    assert rc == 0, err[-2000:]
    rec = _last_record(out)
    assert rec["value"] is None
    assert "total-budget" in rec["skipped"]


def test_sigterm_emits_record_before_exit():
    """SIGTERM (what `timeout` sends — BENCH_r04's rc=124) is converted
    into best-known-record emission instead of a silent death.

    The signal is sent ~12 s in: the interpreter pays ~5 s of sitecustomize
    jax import before bench.main() installs the handler, and a driver
    timeout in the field always arrives minutes later.
    """
    rc, out, err = _run_cli(fault="hang:jax-import", fault_deadline=600,
                            send_term_after=12.0)
    rec = _last_record(out)
    assert rec["value"] is None
    assert "terminated:signal-15" in rec["skipped"]


@pytest.mark.slow
def test_crash_mid_run_falls_back_to_provisional():
    """A crash AFTER a timed epoch reports that epoch's throughput as a
    provisional value rather than losing the measurement."""
    rc, out, err = _run_cli(fault="crash:epoch3", timeout=900)
    assert rc == 0, err[-2000:]
    rec = _last_record(out)
    assert rec["value"] and rec["value"] > 0
    assert rec["provisional"] is True
    assert "child-crashed" in rec["failure"]


@pytest.mark.slow
def test_hang_mid_run_falls_back_to_provisional():
    rc, out, err = _run_cli(fault="hang:epoch3", timeout=900)
    assert rc == 0, err[-2000:]
    rec = _last_record(out)
    assert rec["value"] and rec["value"] > 0
    assert rec["provisional"] is True
    assert "stage-stall:epoch3" in rec["failure"]


@pytest.mark.slow
def test_scaling_mode_cpu_mesh(tmp_path):
    """--devices 8 runs the real e2e loop on the virtual CPU mesh.

    Numbers are meaningless on the 1-core host; this validates the
    multi-device dispatch mechanics (global batch sharded over 'data',
    replicated cache, per-chip reporting) end-to-end via the CLI.
    """
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--platform", "cpu",
         "--devices", "8", "--epochs", "2"],
        capture_output=True, text=True, timeout=900, cwd=REPO, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert rec["devices"] == 8
    assert rec["value"] and rec["value"] > 0
    assert "skipped" not in rec


def test_reporter_without_files_honors_stdout_contract(capsys):
    """--no-watchdog mode (empty hb/result paths): final/skip/provisional
    records must still land on stdout as parseable JSON (review finding:
    they previously went to stderr logs only)."""
    rep = bench.Reporter("", "")
    rep.record("provisional", {"value": 123.0, "devices": 1})
    rep.record("final", {"metric": bench.METRIC_TRAIN, "unit": "img/s/chip",
                         "value": 456.0, "vs_baseline": 2.0})
    rep.record("skip", {"reason": "tpu-pool-unavailable"})
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert lines[0]["value"] == 123.0 and lines[0]["provisional"] is True
    assert lines[1]["value"] == 456.0 and "provisional" not in lines[1]
    assert lines[2]["skipped"] == "tpu-pool-unavailable"


def test_decode_cache_prunes_oldest_beyond_budget(tmp_path, monkeypatch):
    import os
    import time

    from demo2_tpu.data import device_cache as dc

    cache = tmp_path / "dcache"
    cache.mkdir()
    monkeypatch.setattr(dc, "DECODE_CACHE_DIR", str(cache))
    monkeypatch.setattr(dc, "DECODE_CACHE_MAX_BYTES", 2500)
    for i, name in enumerate(("old.npy", "mid.npy", "new.npy")):
        p = cache / name
        p.write_bytes(b"x" * 1000)
        t = 1000 + i
        os.utime(p, (t, t))
    dc._prune_decode_cache(keep=str(cache / "new.npy"))
    left = sorted(f.name for f in cache.iterdir())
    assert left == ["mid.npy", "new.npy"]  # oldest evicted, budget met
    # the just-written entry survives even when it alone exceeds the budget
    monkeypatch.setattr(dc, "DECODE_CACHE_MAX_BYTES", 100)
    dc._prune_decode_cache(keep=str(cache / "new.npy"))
    assert sorted(f.name for f in cache.iterdir()) == ["new.npy"]
