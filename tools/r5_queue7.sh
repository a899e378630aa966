#!/bin/bash
# Round-5 queue #7: re-A/B the fused stem after the NHWC-direct store fix
# (the first integration's win was eaten by the post-kernel transpose).
cd /root/repo
SUMMARY=/tmp/r5q7_summary.txt
: > "$SUMMARY"
run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S))" | tee -a "$SUMMARY"
  timeout 2400 "$@" > "/tmp/r5q7_${name}.log" 2>&1
  rc=$?
  grep -E '^\{|passed|failed|Error' "/tmp/r5q7_${name}.log" | tail -4 >> "$SUMMARY" \
    || echo "[$name rc=$rc — see /tmp/r5q7_${name}.log]" >> "$SUMMARY"
}
run stem_tpu_test env SEAM_TEST_TPU=1 python -m pytest tests/test_pallas_stem.py::test_compiled_matches_xla_on_tpu -q
run bench_pallas  env SEAM_BENCH_STEM=pallas python bench.py
echo "=== queue done $(date +%H:%M:%S)" >> "$SUMMARY"
