"""tools/check_soak.py: the long-horizon stability gate's parser + bands."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tools.check_soak import check, parse_logs  # noqa: E402


def _write_logs(tmp_path, speeds, losses=(2.5, 2.1, 1.8), maps=(55.0,),
                rss_kb=(3_000_000, 3_050_000, 3_040_000, 3_060_000,
                        3_055_000, 3_058_000)):
    train = tmp_path / "train.log"
    lines = []
    for e, s in speeds:
        for i, lo in enumerate(losses):
            lines.append(f"2026-08-19 12:00:00,000 DeMo INFO: Epoch[{e}] "
                         f"Iteration[{(i + 1) * 10}] Loss: {lo}, Acc: 0.5, "
                         f"Base Lr: 1.00e-04")
        lines.append(f"2026-08-19 12:00:01,000 DeMo INFO: Epoch {e} done. "
                     f"Time per batch: 0.107[s] Speed: {s}[samples/s]")
    for v in maps:
        lines.append(f"2026-08-19 12:30:00,000 DeMo INFO: mAP: {v}%")
    train.write_text("\n".join(lines) + "\n")
    rss = tmp_path / "train.rss"
    rss.write_text("".join(f"{1787000000 + 5 * i} {kb}\n"
                           for i, kb in enumerate(rss_kb)))
    return str(train), str(rss)


def _run(tmp_path, **kw):
    train, rss = _write_logs(tmp_path, **{k: v for k, v in kw.items()
                                          if k != "bands"})
    bands = kw.get("bands", {})
    return check(*parse_logs(train, rss),
                 warm_epochs=bands.get("warm_epochs", 3),
                 speed_band=bands.get("speed_band", 0.10),
                 rss_grow_mb=bands.get("rss_grow_mb", 256.0))


def test_clean_run_passes(tmp_path):
    speeds = [(1, 15.8), (2, 480.0)] + [(e, 598.0 + (e % 3)) for e in
                                        range(3, 31)]
    failures, report = _run(tmp_path, speeds=speeds)
    assert failures == []
    assert report["epochs"] == 30
    assert 597.0 < report["steady_median_img_s"] < 602.0


def test_throughput_sag_fails(tmp_path):
    # A late epoch sagging 20% below the steady median must trip the gate.
    speeds = [(e, 600.0) for e in range(1, 30)] + [(30, 480.0)]
    failures, _ = _run(tmp_path, speeds=speeds)
    assert any("strays" in f for f in failures)


def test_nan_loss_fails(tmp_path):
    speeds = [(e, 600.0) for e in range(1, 8)]
    failures, _ = _run(tmp_path, speeds=speeds, losses=(2.5, float("nan")))
    assert any("non-finite losses" in f for f in failures)


def test_rss_leak_fails(tmp_path):
    # +600 MB between the mid and late thirds = leak.
    kb = [3_000_000] * 4 + [3_100_000] * 4 + [3_800_000] * 4
    failures, _ = _run(tmp_path, speeds=[(e, 600.0) for e in range(1, 8)],
                       rss_kb=kb)
    assert any("leak suspected" in f for f in failures)


def test_one_time_allocation_tolerated(tmp_path):
    # Big first-third growth (decode-cache staging) must NOT trip the gate:
    # only mid->late growth counts.
    kb = [1_000_000] * 4 + [3_000_000] * 4 + [3_050_000] * 4
    failures, _ = _run(tmp_path, speeds=[(e, 600.0) for e in range(1, 8)],
                       rss_kb=kb)
    assert failures == []


def test_compile_epochs_exempt(tmp_path):
    # Epochs below --warm-epochs (compile + tail-exec build) are exempt
    # from the speed band.
    speeds = [(1, 15.8), (2, 300.0)] + [(e, 600.0) for e in range(3, 10)]
    failures, _ = _run(tmp_path, speeds=speeds)
    assert failures == []
