#!/bin/bash
# Round-5 queue #5: step A/B at the production precision rule (bf16
# features -> fast adjoint passes) + kernel-level fast number.
cd /root/repo
SUMMARY=/tmp/r5q5_summary.txt
: > "$SUMMARY"
run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S))" | tee -a "$SUMMARY"
  timeout 5400 "$@" > "/tmp/r5q5_${name}.log" 2>&1
  rc=$?
  grep -E '^\{|_JSON |PROFILE_TRAIN_JSON|passed|failed' \
    "/tmp/r5q5_${name}.log" | tail -6 >> "$SUMMARY" || \
    echo "[$name rc=$rc — see /tmp/r5q5_${name}.log]" >> "$SUMMARY"
}
run adjoint_fast      python tools/bench_adjoint.py --backend pallas --precision fast
run fused_adj_fast    python tools/bench_train.py --mode fused  --roi-backend pallas_resident --mask --freeze --adjoint pallas
run linked_adj_fast   python tools/bench_train.py --mode linked --roi-backend pallas_resident --mask --freeze --adjoint pallas
run profile_adj_fast  python tools/profile_train.py --freeze --adjoint pallas --stages boxbranch,mask,full
run adjoint_tpu_test  env SEAM_TEST_TPU=1 python -m pytest tests/test_pallas_roi_adjoint.py::test_compiled_matches_exact_on_tpu -q
echo "=== queue done $(date +%H:%M:%S)" >> "$SUMMARY"
