#!/bin/bash
# Round-3 TPU experiment battery. Waits for the axon tunnel, then runs the
# headline bench (v1 default kernels), the v1-vs-v2 kernel-body A/B, and
# the per-level rate experiments. Logs to $LOG.
set -u
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
LOG=${LOG:-/tmp/tpu_battery.log}
: > "$LOG"
note() { echo "=== $(date +%H:%M:%S) $*" | tee -a "$LOG"; }

probe() {
  timeout 150 python -c "
import jax, jax.numpy as jnp
print(float((jnp.ones((256,256))@jnp.ones((256,256))).sum()))" >> "$LOG" 2>&1
}

note "waiting for tunnel"
until probe; do
  note "tunnel down, retry in 300s"
  sleep 300
done
note "tunnel up"

note "bench v1 (default kernels, batches 128+64)"
timeout 5400 python bench.py >> "$LOG" 2>&1 || note "bench v1 FAILED"

note "bench v2 (loop-free kernel bodies)"
GDDIM_RESBLOCK_IMPL=v2 timeout 5400 python bench.py >> "$LOG" 2>&1 \
  || note "bench v2 FAILED"

note "vpu share (conv floor vs full block)"
timeout 3000 python scripts/exp_vpu_share.py >> "$LOG" 2>&1 \
  || note "exp_vpu_share FAILED"

note "block rates v1"
timeout 3600 python scripts/exp_block_rates.py >> "$LOG" 2>&1 \
  || note "exp_block_rates v1 FAILED"

note "block rates v2"
GDDIM_RESBLOCK_IMPL=v2 timeout 3600 python scripts/exp_block_rates.py \
  >> "$LOG" 2>&1 || note "exp_block_rates v2 FAILED"

note "battery done"
