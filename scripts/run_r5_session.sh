#!/bin/bash
# Round-5 chip session: same-session x1 baselines (verdict #2) then the
# per-level lever battery (verdict #1). One log, timestamps per step.
set -u
cd "$(dirname "$0")/.."
OUT=artifacts/r5_session.log
mkdir -p artifacts
step() { echo "=== $* [$(date +%H:%M:%S)]" | tee -a "$OUT"; }
step "baseline both: cld"
python bench.py --mode both --family cld --batch 128 2>&1 | grep -E "^#|^\{" | tee -a "$OUT"
step "baseline both: blur"
python bench.py --mode both --family blur --batch 128 2>&1 | grep -E "^#|^\{" | tee -a "$OUT"
step "lever battery"
bash scripts/run_r5_levers.sh artifacts/levers_r5.log
step "session done"
