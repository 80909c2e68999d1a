"""Sequential experiment runner (reference: run_sequential_experiments.py).

Runs a list of (name, config, extra-opts) experiments one after another as
subprocesses, with per-experiment failure handling and a summary report.
On a single TPU chip experiments MUST run sequentially — the chip admits one
client at a time (the reference's 4-GPU parallel ablation launch,
scripts/run_ablation_4arch_rgbnt201.sh, maps to separate chips/slices).
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

DEFAULT_EXPERIMENTS = [
    ("baseline", "configs/RGBNT201/Baseline.yml", []),
    ("sdtps", "configs/RGBNT201/DeMo_SDTPS.yml", []),
    ("dgaf_v3", "configs/RGBNT201/DeMo_DGAF.yml", []),
    ("sdtps_dgaf_v3", "configs/RGBNT201/DeMo_SDTPS_DGAF.yml", []),
]


def run_experiment(name, config, opts, python=sys.executable):
    cmd = [python, "tools/train.py", "--config_file", config, "--exp_name", name] + opts
    print(f"[{time.strftime('%H:%M:%S')}] starting {name}: {' '.join(cmd)}")
    t0 = time.time()
    proc = subprocess.run(cmd)
    return {
        "name": name,
        "config": config,
        "returncode": proc.returncode,
        "seconds": round(time.time() - t0, 1),
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--experiments", type=str, default="",
                        help="JSON file with [[name, config, [opts...]], ...]")
    parser.add_argument("--stop_on_failure", action="store_true")
    parser.add_argument("--report", type=str, default="experiment_report.json")
    args = parser.parse_args()

    if args.experiments:
        experiments = json.loads(Path(args.experiments).read_text())
    else:
        experiments = DEFAULT_EXPERIMENTS

    results = []
    for name, config, opts in experiments:
        res = run_experiment(name, config, list(opts))
        results.append(res)
        status = "OK" if res["returncode"] == 0 else f"FAILED({res['returncode']})"
        print(f"[{time.strftime('%H:%M:%S')}] {name}: {status} in {res['seconds']}s")
        if res["returncode"] != 0 and args.stop_on_failure:
            print("stopping on failure")
            break

    Path(args.report).write_text(json.dumps(results, indent=2))
    # Markdown ablation table from per-run JSONL metrics (equivalent of the
    # reference's experiment_result_summary/*.md reports).  Each run's
    # metrics live under ITS OUTPUT_DIR (train.py writes
    # <OUTPUT_DIR>/<exp_name>_metrics.jsonl), so resolve per experiment
    # instead of assuming 'output/'.
    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from demo2_tpu.config import get_cfg_defaults
    from demo2_tpu.utils.metrics_log import write_markdown_report

    def _output_dir(config, opts):
        cfg = get_cfg_defaults()
        if config:
            cfg.merge_from_file(config)
        cfg.merge_from_list(list(opts))
        return cfg.OUTPUT_DIR

    by_name = {name: (config, opts) for name, config, opts in experiments}
    md_path = str(Path(args.report).with_suffix(".md"))
    try:
        # Resolving each run's OUTPUT_DIR re-merges its config file — a bad
        # config (exactly the runs that just failed) must skip the report,
        # not crash the summary below.
        runs = {
            r["name"]: str(
                Path(_output_dir(*by_name[r["name"]]))
                / f"{r['name']}_metrics.jsonl"
            )
            for r in results
        }
        md = write_markdown_report(runs, md_path)
        print(f"markdown report -> {md}")
    except Exception as e:
        print(f"report generation skipped: {e}")
    print("\n===== SUMMARY =====")
    for r in results:
        print(f"  {r['name']:24s} rc={r['returncode']} {r['seconds']}s")
    ok = sum(1 for r in results if r["returncode"] == 0)
    print(f"{ok}/{len(results)} succeeded; report -> {args.report}")
    sys.exit(0 if ok == len(results) else 1)


if __name__ == "__main__":
    main()
