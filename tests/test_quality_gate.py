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


def test_gate_points_cover_every_arch():
    """Every gateable arch has a pinned operating point (id_weight +
    base_lr), so `quality_gate.py --arch X` is self-contained — the
    hardware-tuned values live in ONE table (tools/arch_knobs.py)."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from arch_knobs import ARCH_KNOBS, GATE_POINTS

    assert set(GATE_POINTS) == set(ARCH_KNOBS)
    for arch, point in GATE_POINTS.items():
        assert set(point) == {"id_weight", "base_lr"}, arch
        assert 0.0 < point["id_weight"] < 0.35, arch  # below the
        # e2e bench dataset's saturating 0.35 signal weight
        # an explicit LR pin exists to TAME an unstable arch, so it must
        # sit below the flagship recipe's 3.5e-4 peak
        assert point["base_lr"] is None or 0 < point["base_lr"] < 3.5e-4


def test_generate_invalidates_on_parameter_change(tmp_path):
    """A parameter change must RE-RENDER the shared directory tree, and a
    revisited old parameterization must not trust its stale marker.

    Regression for the 2026-08-19 gate-probe pollution: markers encoded
    only (counts, id_weight) and accumulated, so probe B (id_weight X,
    marker present from hours earlier) silently trained on probe A's
    images and reproduced A's mAP trajectory bit-for-bit."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import glob

    from make_synthetic_jpegs import generate

    root = str(tmp_path / "d")
    kw = dict(num_pids=3, imgs_per_pid=2, test_pids=2, test_imgs_per_pid=1,
              src_size=(24, 12))
    base = os.path.join(root, "RGBNT201")
    sample = os.path.join(base, "train_171", "RGB", "000000_cam1_000.jpg")

    generate(root, id_weight=0.14, **kw)
    first = open(sample, "rb").read()
    mtime = os.path.getmtime(sample)
    generate(root, id_weight=0.14, **kw)  # exact match: skip (idempotent)
    assert os.path.getmtime(sample) == mtime

    generate(root, id_weight=0.30, **kw)  # new weight: re-render in place
    second = open(sample, "rb").read()
    assert second != first
    # only ONE marker may survive, so the stale one can't validate later
    assert len(glob.glob(os.path.join(base, ".complete_*"))) == 1

    generate(root, id_weight=0.14, **kw)  # REVISIT: must re-render
    assert open(sample, "rb").read() == first  # seeded renderer: exact

    # pid-count decrease must not leave stale extra ids for the parsers
    generate(root, num_pids=2, imgs_per_pid=2, test_pids=2,
             test_imgs_per_pid=1, src_size=(24, 12), id_weight=0.14)
    pids = {f.split("_")[0] for f in
            os.listdir(os.path.join(base, "train_171", "RGB"))}
    assert pids == {"000000", "000001"}


def test_trajectory_recorder_series():
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from quality_gate import TrajectoryRecorder

    rec = TrajectoryRecorder()
    rec.add_scalar("Val/mAP", 0.3, 1)
    rec.add_scalar("Train/Loss", 9.0, 1)
    rec.add_scalar("Val/mAP", 0.5, 2)
    assert rec.series("Val/mAP") == [0.3, 0.5]
    assert rec.series("Val/Rank-1") == []


def test_gate_schedule_points():
    """The two operating points' schedule shapes (VERDICT r4 #6): 'tuned'
    keeps the round-4 pinned shape; 'reference' scales the canonical
    recipe's warmup-10 + steps-(30,40) of 50 epochs proportionally."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from quality_gate import gate_schedule

    assert gate_schedule("tuned", 8) == (2, (5,))
    assert gate_schedule("reference", 8) == (2, (5, 6))
    assert gate_schedule("reference", 10) == (2, (6, 8))
    # at the reference's own budget the shape is exact
    assert gate_schedule("reference", 50) == (10, (30, 40))
    # overrides still win
    assert gate_schedule("tuned", 8, warmup_override=1, step_override=4) == (
        1, (4,))
    # --lr-step at the reference point sets the FIRST milestone; the second
    # keeps the canonical (40-30)/50 spacing
    assert gate_schedule("reference", 8, step_override=4) == (2, (4, 6))
    # degenerate budgets keep warmup < first step < second step
    w, st = gate_schedule("reference", 3)
    assert w >= 1 and st[0] > w and st[1] > st[0]
