#!/bin/bash
# Round-4 hardware checklist — run when the TPU pool is back (one JAX
# process at a time; each step logs under logs/r4/).
#
#   bash scripts/hardware_day_r4.sh [step...]     # default: all steps
#
# Steps:
#   bench      e2e bench confirm (the driver metric) + pipelined-augment A/B
#   dotrain    do_train re-measure with the AsyncWriter (VERDICT r3 weak #2)
#   quality    full-width non-saturating quality gate (VERDICT r3 #3)
#   profile    jax.profiler trace attempt + cost-analysis fallback (#5)

set -u
cd "$(dirname "$0")/.."
mkdir -p logs/r4
STEPS=${@:-"bench dotrain quality profile"}

run() {  # run <name> <cmd...>
    local name=$1; shift
    local log="logs/r4/${name}_$(date +%Y%m%d_%H%M%S).log"
    echo "=== ${name}: $* (log: ${log})"
    "$@" 2>&1 | tee "${log}"
    echo "=== ${name} rc=${PIPESTATUS[0]}"
}

for s in ${STEPS}; do
  case "$s" in
    bench)
      # Default run = exactly what the driver executes.
      run bench_default python bench.py
      # A/B: round-3 serial-augment layout vs the pipelined scan body.
      run bench_noaug_pipe python bench.py --set TPU.PIPELINED_AUGMENT=False
      ;;
    dotrain)
      run dotrain python tools/train.py \
        --config_file configs/RGBNT201/DeMo_SDTPS_DGAF.yml \
        DATASETS.ROOT_DIR /tmp/d2t_synth \
        SOLVER.MAX_EPOCHS 4 SOLVER.EVAL_PERIOD 4 SOLVER.IMS_PER_BATCH 64 \
        DATALOADER.NUM_INSTANCE 8 TPU.DATA_CACHE device \
        TPU.BF16_MOMENTS True TPU.BF16_SECOND_MOMENT True \
        OUTPUT_DIR ./logs/r4/e2e
      ;;
    quality)
      # Assertions LIVE (the gate gates); if the default band proves
      # mis-tuned on first hardware contact, adjust --band-lo/--band-hi
      # from the recorded trajectory and pin the result in docs/PARITY.md.
      run quality python tools/quality_gate.py \
        --report reports/quality_gate.json
      ;;
    profile)
      run profile python tools/profile_trace.py --log-dir logs/r4/profile
      ;;
    chunksweep)
      # K = steps per dispatch; cheap once the executable is warm.
      for k in 2 5 10 20; do
        run "chunk_k${k}" python bench.py --chunk "${k}"
      done
      ;;
    kernels)
      # Pallas kernels on real hardware (suite-gated tests).
      run kernels env DEMO2_TEST_TPU=1 python -m pytest tests/test_tpu_kernels.py -q
      ;;
    soak)
      # Long-horizon stability: 30 epochs at the flagship operating point
      # with eval + checkpoints live, host RSS sampled by a sidecar, then
      # tools/check_soak.py gates on flat throughput / finite losses /
      # flat RSS (see its docstring for the exact bands).
      SOAK_LOG="logs/r4/soak_$(date +%Y%m%d_%H%M%S).log"
      RSS_LOG="${SOAK_LOG%.log}.rss"
      echo "=== soak: 30-epoch run (log: ${SOAK_LOG})"
      python tools/train.py \
        --config_file configs/RGBNT201/DeMo_SDTPS_DGAF.yml \
        DATASETS.ROOT_DIR /tmp/d2t_synth \
        SOLVER.MAX_EPOCHS 30 SOLVER.EVAL_PERIOD 10 \
        SOLVER.CHECKPOINT_PERIOD 10 SOLVER.IMS_PER_BATCH 64 \
        DATALOADER.NUM_INSTANCE 8 TPU.DATA_CACHE device \
        TPU.BF16_MOMENTS True TPU.BF16_SECOND_MOMENT True \
        OUTPUT_DIR ./logs/r4/soak > "${SOAK_LOG}" 2>&1 &
      SOAK_PID=$!
      while kill -0 "${SOAK_PID}" 2>/dev/null; do
        echo "$(date +%s) $(ps -o rss= -p ${SOAK_PID} | tr -d ' ')" >> "${RSS_LOG}"
        sleep 5
      done
      wait "${SOAK_PID}"; echo "=== soak train rc=$?"
      run soak_check python tools/check_soak.py \
        --train-log "${SOAK_LOG}" --rss-log "${RSS_LOG}" \
        --report reports/soak.json
      ;;
    *) echo "unknown step: $s" ;;
  esac
done
echo "hardware day done; summarize into docs/PERF.md + docs/PARITY.md"
