#!/bin/bash
# Round-5 on-chip measurement queue #1 (VERDICT r4 #1/#4/#6).
# Sequential; logs to /tmp/r5q_<name>.log; summary lines to /tmp/r5q_summary.txt.
cd /root/repo
SUMMARY=/tmp/r5q_summary.txt
: > "$SUMMARY"

run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S))" | tee -a "$SUMMARY"
  timeout 5400 "$@" > "/tmp/r5q_${name}.log" 2>&1
  rc=$?
  grep -E '^\{|^PROFILE_TRAIN_JSON' "/tmp/r5q_${name}.log" >> "$SUMMARY" || \
    echo "[$name rc=$rc — see /tmp/r5q_${name}.log]" >> "$SUMMARY"
}

# 0. bench at HEAD: reference point + validates the new tflops/hbm keys
run bench_head      python bench.py

# 1. Training per-stage roofline profile, PRODUCTION config (frozen mask)
run profile_train   python tools/profile_train.py

# 2. The stop-gradient stem lever, per-stage view (backbone + full)
run profile_freeze  python tools/profile_train.py --freeze --stages backbone,full

# 3. Step-rate A/Bs: r4 continuity (unmasked) then production mask, then +freeze
run fused_nomask    python tools/bench_train.py --mode fused  --roi-backend pallas_resident
run fused_mask      python tools/bench_train.py --mode fused  --roi-backend pallas_resident --mask
run fused_freeze    python tools/bench_train.py --mode fused  --roi-backend pallas_resident --mask --freeze
run linked_mask     python tools/bench_train.py --mode linked --roi-backend pallas_resident --mask
run linked_freeze   python tools/bench_train.py --mode linked --roi-backend pallas_resident --mask --freeze

# 4. End-to-end epoch throughput with the host data pipeline (prefetch A/B)
run epoch1_pf       python tools/bench_epoch.py --phase 1 --prefetch-depth 2
run epoch1_nopf     python tools/bench_epoch.py --phase 1 --prefetch-depth 0
run epoch2_pf       python tools/bench_epoch.py --phase 2 --prefetch-depth 2
run epoch2_nopf     python tools/bench_epoch.py --phase 2 --prefetch-depth 0

echo "=== queue done $(date +%H:%M:%S)" >> "$SUMMARY"
