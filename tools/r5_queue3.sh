#!/bin/bash
# Round-5 on-chip queue #3: resident-adjoint kernel A/B + fused-stem probe
# retry (pltpu.roll sign fixed).  Logs /tmp/r5q3_<name>.log.
cd /root/repo
SUMMARY=/tmp/r5q3_summary.txt
: > "$SUMMARY"

run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S))" | tee -a "$SUMMARY"
  timeout 5400 "$@" > "/tmp/r5q3_${name}.log" 2>&1
  rc=$?
  grep -E '^\{|_JSON |ms/batch-11|us/strip|: FAIL|passed|failed' \
    "/tmp/r5q3_${name}.log" | tail -12 >> "$SUMMARY" || \
    echo "[$name rc=$rc — see /tmp/r5q3_${name}.log]" >> "$SUMMARY"
}

# compiled-kernel correctness on the chip first
run adjoint_tpu_test env SEAM_TEST_TPU=1 python -m pytest \
    tests/test_pallas_roi_adjoint.py::test_compiled_matches_exact_on_tpu -q

# adjoint A/B at production training geometry
run adjoint_xla    python tools/bench_adjoint.py --backend xla
run adjoint_pallas python tools/bench_adjoint.py --backend pallas

# fused-stem constructions, take 2 (roll sign fixed)
run stem_probe2    python tools/exp_stem_im2col.py

# int8/control gate RESCUE at the recalibrated confusable delta (the
# delta-18 run in queue2 measured top-1 == 0 on every strategy — no
# instrument signal; see _synth_train.confusable_palette docstring)
run int8_64r       python tools/validate_int8.py --products 64 --confusable

echo "=== queue done $(date +%H:%M:%S)" >> "$SUMMARY"
