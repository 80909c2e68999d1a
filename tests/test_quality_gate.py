"""Quality-gate tool mechanics (tools/quality_gate.py, VERDICT r3 #3).

The real gate runs full-width on the TPU; --tiny validates the plumbing on
the CPU mesh: dataset generation with a lowered id_weight, do_train with
the trajectory-recording writer, per-epoch mAP capture, check evaluation,
and the JSON report contract.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_quality_gate_tiny_mechanics(tmp_path):
    report = tmp_path / "qg.json"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/quality_gate.py"),
         "--tiny", "--report-only", "--epochs", "2",
         "--root", str(tmp_path / "data"), "--report", str(report)],
        capture_output=True, text=True, timeout=900, cwd=REPO, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    rec = json.loads(report.read_text())
    assert rec["config"]["tiny"] is True
    assert len(rec["mAP_trajectory"]) == 2  # EVAL_PERIOD=1, one per epoch
    assert all(0.0 <= m <= 1.0 for m in rec["mAP_trajectory"])
    assert set(rec["checks"]) == {
        "first_eval_below_ceiling", "improves", "best_in_band"
    }
    # A 2-epoch tiny run must NOT look saturated on the hardened recipe.
    assert rec["mAP_trajectory"][0] < 0.9


def test_trajectory_recorder_series():
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from quality_gate import TrajectoryRecorder

    rec = TrajectoryRecorder()
    rec.add_scalar("Val/mAP", 0.3, 1)
    rec.add_scalar("Train/Loss", 9.0, 1)
    rec.add_scalar("Val/mAP", 0.5, 2)
    assert rec.series("Val/mAP") == [0.3, 0.5]
    assert rec.series("Val/Rank-1") == []
