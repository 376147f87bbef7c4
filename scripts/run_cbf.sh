#!/usr/bin/env bash
# Reference parity: workspace/experiments/scripts/run_cbf.sh — the
# CBF-only (single-step QP) pipeline.
set -euo pipefail
BASE=${BASE:-configs/base_config.json}
TASK=${1:?usage: run_cbf.sh <task.json> [fov|connectivity] [runtime]}
FAMILY=${2:-connectivity}
RUNTIME=${3:-8.0}
OUT=${OUT:-/tmp/cbf_states.json}
PLATFORM=${PLATFORM:-}

args=(--base "$BASE" --task "$TASK" --controller "cbf-$FAMILY" \
      --sim-runtime "$RUNTIME" --out "$OUT")
[ -n "$PLATFORM" ] && args+=(--platform "$PLATFORM")
python -m mpc_cbf_tpu.apps.run_sim "${args[@]}"
python -m mpc_cbf_tpu.apps.plot_results --states "$OUT" --out "${OUT%.json}.png"
