#!/usr/bin/env bash
# 4-architecture ablation on RGBNT201: Baseline / SDTPS / DGAFv3 / SDTPS+DGAFv3.
# (Reference: scripts/run_ablation_4arch_rgbnt201.sh runs 4 configs on 4 GPUs
# in parallel; a single TPU chip admits one client, so this runs them
# sequentially via the experiment runner. On a multi-chip pod, launch one
# runner per slice instead.)
set -euo pipefail
cd "$(dirname "$0")/.."
python tools/run_experiments.py "$@"
