#!/usr/bin/env bash
# Reference parity: workspace/experiments/bash/ScaleScript.sh — but the
# seed axis is a batched scenario axis on the device mesh, not a bash loop.
set -euo pipefail
BASE=${BASE:-configs/base_config.json}
SIZES=${SIZES:-"2 4 8"}
SEEDS=${SEEDS:-15}
OUT=${OUT:-/tmp/sweep.jsonl}
PLATFORM=${PLATFORM:-}

args=(--base "$BASE" --sizes $SIZES --seeds "$SEEDS" --out "$OUT")
[ -n "$PLATFORM" ] && args+=(--platform "$PLATFORM")
python -m mpc_cbf_tpu.apps.sweep "${args[@]}"
python -m mpc_cbf_tpu.apps.statistics --results "$OUT" --plot "${OUT%.jsonl}.png"
