#!/usr/bin/env bash
# Round-5 variance series (VERDICT directive #5): repeat the scoreboard
# measurements >=5 times on the real chip and report spread.
# Usage: bash scripts/bench_variance.sh [reps] > variance.jsonl
set -u
REPS="${1:-5}"
cd "$(dirname "$0")/.."

for i in $(seq 1 "$REPS"); do
  python bench.py 0 fov 2>/dev/null | tail -1
done
for i in $(seq 1 "$REPS"); do
  python bench.py 0 fov+certified 2>/dev/null | tail -1
done
for i in $(seq 1 "$REPS"); do
  python benchmarks/latency.py 8 1 fov 2>/dev/null | tail -1
done
for i in $(seq 1 "$REPS"); do
  python benchmarks/latency.py 8 64 fov 2>/dev/null | tail -1
done
