#!/bin/bash
# Round-5 on-chip queue #4: resident-adjoint step-level A/B on a clean
# chip + final HEAD pins.  Logs /tmp/r5q4_<name>.log.
cd /root/repo
SUMMARY=/tmp/r5q4_summary.txt
: > "$SUMMARY"

run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S))" | tee -a "$SUMMARY"
  timeout 5400 "$@" > "/tmp/r5q4_${name}.log" 2>&1
  rc=$?
  grep -E '^\{|_JSON |PROFILE_TRAIN_JSON|passed|failed' \
    "/tmp/r5q4_${name}.log" | tail -6 >> "$SUMMARY" || \
    echo "[$name rc=$rc — see /tmp/r5q4_${name}.log]" >> "$SUMMARY"
}

# kernel-level A/B (xla numbers from queue3: box7 51.17 / mask14 40.59)
run adjoint_pallas python tools/bench_adjoint.py --backend pallas

# step-level A/B at the production config (mask + freeze)
run fused_adj_xla    python tools/bench_train.py --mode fused  --roi-backend pallas_resident --mask --freeze --adjoint xla
run fused_adj_pallas python tools/bench_train.py --mode fused  --roi-backend pallas_resident --mask --freeze --adjoint pallas
run linked_adj_pallas python tools/bench_train.py --mode linked --roi-backend pallas_resident --mask --freeze --adjoint pallas

# branch-level view of where the adjoint milliseconds went
run profile_adj_pallas python tools/profile_train.py --freeze --adjoint pallas --stages boxbranch,mask,full

# final HEAD pins: serving parity + fast profile + training contract line
run bench_parity  python bench.py
run bench_fast    env SEAM_BENCH_PROFILE=fast python bench.py
run bench_trainp  env SEAM_BENCH_PROFILE=train python bench.py

# compiled-kernel regressions at final HEAD
run tpu_marked    env SEAM_TEST_TPU=1 python -m pytest tests/ -m tpu -q

echo "=== queue done $(date +%H:%M:%S)" >> "$SUMMARY"
