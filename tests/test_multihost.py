"""Multi-host (multi-process) data parallelism: 2-process == 1-process.

The reference scales across hosts with torch DDP + a gloo-broadcast seed
(data/datasets/sampler_ddp.py:117-201, engine/processor.py:34-37).  The
TPU-native replacement (parallel/multihost.py) must make multi-process
training numerically IDENTICAL to single-process: same global PK order,
same per-sample augmentations (RNG keyed on global batch position), same
global-batch loss/BN semantics, same eval metrics on every host.

This test launches 2 real `jax.distributed` processes (4 virtual CPU
devices each -> one 8-device global mesh, coordinator on localhost), runs
the REAL `do_train` + eval loop in each, and compares against the identical
config run single-process on the in-test 8-device mesh.
"""

import json
import os
import pathlib
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # spawns real jax.distributed subprocesses (minutes)

ROOT = pathlib.Path(__file__).resolve().parents[1]
WORKER = ROOT / "tests" / "multihost_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_matches_single_process(tmp_path):
    port = _free_port()
    outs = [str(tmp_path / f"proc{i}.json") for i in range(2)]
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.update(
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
        PYTHONPATH=str(ROOT),
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(i), "2", str(port), outs[i]],
            env=env, cwd=str(ROOT),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=1500)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-host worker timed out")
        logs.append(out)
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"worker {i} failed:\n{logs[i][-4000:]}"

    res = [json.load(open(o)) for o in outs]
    for i, r in enumerate(res):
        assert r["process_count"] == 2
        assert r["global_devices"] == 8
        assert r["local_devices"] == 4
        assert r["process_index"] == i

    # Both hosts computed the SAME replicated state and metrics.
    assert res[0]["step"] == res[1]["step"] > 0
    np.testing.assert_allclose(res[0]["mAP"], res[1]["mAP"], rtol=0, atol=0)
    p0 = np.load(outs[0] + ".params.npy")
    p1 = np.load(outs[1] + ".params.npy")
    np.testing.assert_array_equal(p0, p1, err_msg="hosts diverged")

    # Single-process 8-device reference run of the identical config, through
    # the same code path (HostShardedBatches degrades to the plain pipeline).
    from tests.multihost_worker import run

    ref_out = str(tmp_path / "single.json")
    run(ref_out)
    ref = json.load(open(ref_out))
    assert ref["process_count"] == 1 and ref["global_devices"] == 8
    assert ref["step"] == res[0]["step"]

    # Global-batch semantics: per-host slicing must not change the math.
    # Tight anchor = ONE optimizer step from the common init: params agree
    # within cross-program reduction-order noise (multi-process CPU
    # collectives reduce in a different order than the single-process
    # program).  Per-SHARD semantics would instead diverge at lr scale on
    # most elements.
    s1_multi = np.load(outs[0] + ".step1.npy")
    s1_single = np.load(ref_out + ".step1.npy")
    np.testing.assert_allclose(s1_multi, s1_single, rtol=2e-3, atol=5e-4)
    assert np.mean(np.abs(s1_multi - s1_single) > 1e-4) < 0.05

    # Full 2-epoch trajectories across DIFFERENT topologies are chaotic —
    # batch-hard mining flips on reduction-order ulps (round-3 cross-check
    # protocol: assert early tracking + outcome, not late-epoch params) —
    # so the multi-epoch comparison is the OUTCOME: the trivially-separable
    # synthetic set must reach the same (saturated) metrics.
    assert abs(res[0]["mAP"] - ref["mAP"]) <= 0.05
    assert abs(res[0]["rank1"] - ref["rank1"]) <= 0.05
    assert res[0]["mAP"] >= 0.95 and ref["mAP"] >= 0.95
