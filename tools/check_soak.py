"""Assert long-horizon training stability from a do_train log + RSS samples.

The soak artifact the reference never ships: its longest published runs are
the 50-epoch ablations (engine/processor.py:56 logs per-epoch speed but
nothing gates on it).  Here a 30-epoch flagship run on the TPU must hold

  1. throughput flat: every steady-state epoch (>= --warm-epochs) within
     --speed-band of the steady median — catches compile-cache churn,
     growing host dispatch overhead, and device-side slowdown;
  2. losses finite in every logged iteration — catches late-onset numeric
     blowups that short benches never see;
  3. host RSS flat: peak RSS in the last third of the run no more than
     --rss-grow-mb above the peak in the middle third — catches per-step
     host leaks (python graph refs, orbax handles, TB writer buffers)
     while ignoring the big one-time allocations (decode cache staging)
     that dominate the first third;
  4. eval mAP present and finite whenever the run evaluated.

Usage:
  python tools/check_soak.py --train-log LOG --rss-log RSS.log \
      [--report reports/soak.json]

RSS.log is produced by the sidecar in scripts/hardware_day_r4.sh: one
"<unix_ts> <rss_kb>" line per sample of the training process.
"""

from __future__ import annotations

import argparse
import json
import math
import re
import sys

SPEED_RE = re.compile(r"Epoch (\d+) done\. Time per batch: [\d.]+\[s\] "
                      r"Speed: ([\d.]+)\[samples/s\]")
LOSS_RE = re.compile(r"Epoch\[(\d+)\] Iteration\[\d+\] Loss: (\S+),")
MAP_RE = re.compile(r"mAP: ([\d.]+|nan)%")


def parse_logs(train_log: str, rss_log: str):
    speeds, losses, maps = [], [], []
    with open(train_log) as f:
        for line in f:
            m = SPEED_RE.search(line)
            if m:
                speeds.append((int(m.group(1)), float(m.group(2))))
                continue
            m = LOSS_RE.search(line)
            if m:
                losses.append((int(m.group(1)), float(m.group(2))))
                continue
            m = MAP_RE.search(line)
            if m:
                maps.append(float(m.group(1)))
    rss = []
    try:
        with open(rss_log) as f:
            for line in f:
                parts = line.split()
                if len(parts) == 2:
                    rss.append((float(parts[0]), int(parts[1])))
    except FileNotFoundError:
        pass
    return speeds, losses, maps, rss


def check(speeds, losses, maps, rss, warm_epochs, speed_band, rss_grow_mb):
    failures = []
    steady = [s for e, s in speeds if e >= warm_epochs]
    if len(steady) < 3:
        failures.append(f"only {len(steady)} steady epochs logged "
                        f"(warm-epochs={warm_epochs})")
        med = float("nan")
    else:
        med = sorted(steady)[len(steady) // 2]
        for e, s in speeds:
            if e >= warm_epochs and abs(s - med) > speed_band * med:
                failures.append(
                    f"epoch {e} speed {s:.1f} strays >{speed_band:.0%} from "
                    f"steady median {med:.1f}")

    bad = [(e, v) for e, v in losses if not math.isfinite(v)]
    if bad:
        failures.append(f"non-finite losses at epochs {sorted({e for e, _ in bad})}")
    if not losses:
        failures.append("no loss lines found")

    if not maps:
        failures.append("no eval mAP lines found")
    elif any(not math.isfinite(v) for v in maps):
        failures.append(f"non-finite eval mAP: {maps}")

    rss_mid_peak = rss_late_peak = None
    if rss:
        n = len(rss)
        mid = [kb for _, kb in rss[n // 3: 2 * n // 3]]
        late = [kb for _, kb in rss[2 * n // 3:]]
        if mid and late:
            rss_mid_peak = max(mid) / 1024.0
            rss_late_peak = max(late) / 1024.0
            if rss_late_peak - rss_mid_peak > rss_grow_mb:
                failures.append(
                    f"host RSS grew {rss_late_peak - rss_mid_peak:.0f} MB "
                    f"mid->late (cap {rss_grow_mb} MB): leak suspected")
    else:
        failures.append("no RSS samples (sidecar not running?)")

    return failures, {
        "epochs": len(speeds),
        "steady_median_img_s": med,
        "steady_min_img_s": min(steady) if steady else None,
        "steady_max_img_s": max(steady) if steady else None,
        "loss_lines": len(losses),
        "eval_maps": maps,
        "rss_mid_peak_mb": rss_mid_peak,
        "rss_late_peak_mb": rss_late_peak,
        "failures": failures,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train-log", required=True)
    ap.add_argument("--rss-log", required=True)
    ap.add_argument("--report", default="")
    ap.add_argument("--warm-epochs", type=int, default=3,
                    help="first steady epoch (1-2 pay compile + tail exec)")
    ap.add_argument("--speed-band", type=float, default=0.10,
                    help="allowed fraction around the steady median; evals/"
                         "ckpts run OUTSIDE the epoch timer so steady epochs "
                         "have no excuse to stray")
    ap.add_argument("--rss-grow-mb", type=float, default=256.0)
    args = ap.parse_args()

    speeds, losses, maps, rss = parse_logs(args.train_log, args.rss_log)
    failures, report = check(speeds, losses, maps, rss, args.warm_epochs,
                             args.speed_band, args.rss_grow_mb)
    report["ok"] = not failures
    print(json.dumps(report, indent=1))
    if args.report:
        with open(args.report, "w") as f:
            json.dump(report, f, indent=1)
    if failures:
        print("SOAK FAILED:", *failures, sep="\n  - ", file=sys.stderr)
        return 1
    print(f"SOAK PASSED: {len(speeds)} epochs, steady "
          f"{report['steady_min_img_s']:.1f}-{report['steady_max_img_s']:.1f} "
          f"img/s (median {report['steady_median_img_s']:.1f})",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
