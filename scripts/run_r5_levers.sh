#!/bin/bash
# Round-5 lever battery: end-to-end bench points for the per-level
# (group, bt) re-sweep under the v2+scatter default kernel policy.
# Points picked from the same-session full-block A/B (exp_block_ab_r5.py):
#   single 8x8  bt16    0.019 vs 0.031 ms
#   single 4x4  g9      0.007 vs 0.026 ms
#   single 32x32 bt4    0.213 vs 0.219 ms
#   pair 32x32/256 bt2  0.346 vs 0.358 ms
#   pair 4x4 bt32+g9    ~0.01 vs 0.040 ms
# Standalone wins do not compose (round-3c lesson) — these points decide.
# Usage: bash scripts/run_r5_levers.sh [outfile]
set -u
cd "$(dirname "$0")/.."
OUT=${1:-artifacts/levers_r5.log}
mkdir -p artifacts

run_point() {
  local label="$1"; shift
  echo "### $label  [$(date +%H:%M:%S)]" | tee -a "$OUT"
  env "$@" python bench.py --batch 128 --mode opt --family cld \
    --no-blur-extra 2>&1 | grep -E "^#|^\{" | tee -a "$OUT"
}

run_point "defaults (r4 policy)"
run_point "small-levels combo" \
  GDDIM_RESBLOCK_BT_MAP=64.256:16,16.512:32 \
  GDDIM_CONV9_GROUP_MAP=16.256:9,16.512:9
run_point "full combo" \
  GDDIM_RESBLOCK_BT_MAP=64.256:16,16.512:32,1024.128:4,1024.256:2 \
  GDDIM_CONV9_GROUP_MAP=16.256:9,16.512:9
run_point "full combo minus 32x32" \
  GDDIM_RESBLOCK_BT_MAP=64.256:16,16.512:32,1024.256:2 \
  GDDIM_CONV9_GROUP_MAP=16.256:9,16.512:9

echo "battery done" | tee -a "$OUT"
