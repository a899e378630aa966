#!/bin/bash
# Round-5 queue #6: the serving stem A/B (VERDICT r4 #5 integration leg).
# 1) compiled stem parity on the chip, 2) bench.py with the XLA stem
# (baseline at HEAD), 3) bench.py with the fused Pallas stem.
cd /root/repo
SUMMARY=/tmp/r5q6_summary.txt
: > "$SUMMARY"
run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S))" | tee -a "$SUMMARY"
  timeout 3000 "$@" > "/tmp/r5q6_${name}.log" 2>&1
  rc=$?
  grep -E '^\{|passed|failed|Error' "/tmp/r5q6_${name}.log" | tail -4 >> "$SUMMARY" \
    || echo "[$name rc=$rc — see /tmp/r5q6_${name}.log]" >> "$SUMMARY"
}
run stem_tpu_test env SEAM_TEST_TPU=1 python -m pytest tests/test_pallas_stem.py -q
run bench_xla     python bench.py
run bench_pallas  env SEAM_BENCH_STEM=pallas python bench.py
echo "=== queue done $(date +%H:%M:%S)" >> "$SUMMARY"
