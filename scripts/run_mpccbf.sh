#!/usr/bin/env bash
# Reference parity: workspace/experiments/scripts/run_mpccbf.sh —
# preprocess config -> run sim -> plot -> score, for one task instance.
set -euo pipefail
BASE=${BASE:-configs/base_config.json}
TASK=${1:?usage: run_mpccbf.sh <task.json> [controller] [runtime]}
CONTROLLER=${2:-connectivity}
RUNTIME=${3:-6.0}
OUT=${OUT:-/tmp/mpccbf_states.json}
PLATFORM=${PLATFORM:-}

args=(--base "$BASE" --task "$TASK" --controller "$CONTROLLER" \
      --sim-runtime "$RUNTIME" --out "$OUT")
[ -n "$PLATFORM" ] && args+=(--platform "$PLATFORM")
python -m mpc_cbf_tpu.apps.run_sim "${args[@]}"
python -m mpc_cbf_tpu.apps.plot_results --states "$OUT" --out "${OUT%.json}.png"
