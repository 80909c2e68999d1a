#!/bin/bash
# Wait for the current training run to finish, then launch the next config.
# TPU equivalent of the reference's wait_and_run.sh (sleep-until-GPU-free):
# this box exposes ONE TPU chip through a claim that serializes clients, so
# a second training process would block on the claim; we wait for the
# current tools/train.py to exit instead (read-only pgrep — never kill).
#
# Usage:   bash scripts/wait_and_run.sh <config.yml> [extra opts...]
# Example: bash scripts/wait_and_run.sh configs/RGBNT201/DeMo_SDTPS.yml

set -u
if [ $# -eq 0 ]; then
    echo "usage: bash scripts/wait_and_run.sh <config.yml> [opts...]"
    exit 1
fi
CONFIG_FILE=$1
shift
if [ ! -f "${CONFIG_FILE}" ]; then
    echo "config not found: ${CONFIG_FILE}"
    exit 1
fi

echo "waiting for the current tools/train.py to finish..."
while pgrep -f "tools/train.py" > /dev/null; do
    printf '\rwaiting... %s ' "$(date '+%H:%M:%S')"
    sleep 10
done
echo
echo "previous run done; waiting 10s for the TPU claim to release..."
sleep 10

LOG_DIR="experiment_logs"
mkdir -p "${LOG_DIR}"
LOG_FILE="${LOG_DIR}/$(basename "${CONFIG_FILE}" .yml)_$(date +%Y%m%d_%H%M%S).log"
echo "starting: ${CONFIG_FILE} (log: ${LOG_FILE})"
python tools/train.py --config_file "${CONFIG_FILE}" "$@" 2>&1 | tee "${LOG_FILE}"
echo "finished at $(date '+%Y-%m-%d %H:%M:%S')"
