#!/bin/bash
# Round-5 lever battery: end-to-end bench points for the tap-group and
# batch-tile re-sweep under the v2+scatter default kernel policy. Points
# chosen from the scatter conv-only floor sweep (scripts/exp_floor_scatter.py):
#   32x32 pair conv1 prefers g=9 (+20% floor), 8x8 pair conv1 prefers g=1,
#   4x4 prefers g=9, 8x8 singles prefer g=9@bt8 or g=3@bt16.
# Each point is one bench.py opt run at b128, no blur piggyback.
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

run_point "defaults (g=3 all, bt auto)"
run_point "g9 32x32-pair-conv1" GDDIM_CONV9_GROUP_MAP=1024.256:9,1024.384:9
run_point "g9 4x4-256wide" GDDIM_CONV9_GROUP_MAP=16.256:9
run_point "4x4-pair bt32+g9" GDDIM_CONV9_GROUP_MAP=16.512:9 GDDIM_RESBLOCK_BT_MAP=16.512:32
run_point "g1 8x8-pair-conv1" GDDIM_CONV9_GROUP_MAP=64.512:1
run_point "g9 8x8" GDDIM_CONV9_GROUP_MAP=64:9
run_point "bt16 8x8-singles" GDDIM_RESBLOCK_BT_MAP=64.256:16
# v2's whole-tile VPU passes lose to v1's per-sample unroll at the 8x8 pair
# (full-block 0.145 ms v2+scatter vs 0.063 ms v1/gather in round 3c)
run_point "v1 8x8-pair" GDDIM_RESBLOCK_IMPL_MAP=64.512:1
run_point "v1 8x8+4x4-pairs" GDDIM_RESBLOCK_IMPL_MAP=64.512:1,16.512:1
run_point "bt4 32x32 (v2 retest)" GDDIM_RESBLOCK_BT_MAP=1024:4
# combo: 8x8 singles take bt16+g3 (floor 0.018 ms beats bt8+g9's 0.023);
# everything else takes its floor-best group
run_point "combo floors-best" \
  GDDIM_CONV9_GROUP_MAP=1024.256:9,1024.384:9,16.256:9,16.512:9,64.512:1 \
  GDDIM_RESBLOCK_BT_MAP=64.256:16,16.512:32

echo "battery done" | tee -a "$OUT"
