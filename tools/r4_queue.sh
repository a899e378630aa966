#!/bin/bash
# Round-4 on-chip measurement queue (VERDICT r3 #1/#3/#4).
# Sequential; logs to /tmp/r4q_<name>.log; summary JSON lines to /tmp/r4q_summary.txt.
cd /root/repo
SUMMARY=/tmp/r4q_summary.txt
: > "$SUMMARY"

run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S))" | tee -a "$SUMMARY"
  timeout 3600 "$@" > "/tmp/r4q_${name}.log" 2>&1
  rc=$?
  tail -2 "/tmp/r4q_${name}.log" | grep -E '^\{' >> "$SUMMARY" || \
    echo "[$name rc=$rc — see /tmp/r4q_${name}.log]" >> "$SUMMARY"
}

# 1. Train-step backend A/B (fused, single-orientation batch)
run fused_pallas    python tools/bench_train.py --mode fused --roi-backend pallas
run fused_resident  python tools/bench_train.py --mode fused --roi-backend pallas_resident
run fused_xla       python tools/bench_train.py --mode fused --roi-backend xla

# 2. Mixed-orientation batch: Phase1Trainer linked vs accum triple
run linked_pallas   python tools/bench_train.py --mode linked --roi-backend pallas
run linked_resident python tools/bench_train.py --mode linked --roi-backend pallas_resident
run accum_pallas    python tools/bench_train.py --mode accum  --roi-backend pallas

# 3. Serving stage breakdown at HEAD (resident backend = serving default)
run profile_resident python tools/profile_serving.py --roi-backend pallas_resident

# 4. bench.py at HEAD (reference point before round-4 serving work)
run bench_head      python bench.py

echo "=== queue done $(date +%H:%M:%S)" >> "$SUMMARY"
