#!/bin/bash
# Round-4 follow-up on-chip queue: serving-tail lever (bf16 match trunks).
# Run AFTER tools/validate_int8.py finishes (serial chip access).
# Logs to /tmp/r4q2_<name>.log; summary lines to /tmp/r4q2_summary.txt.
cd /root/repo
SUMMARY=/tmp/r4q2_summary.txt
: > "$SUMMARY"

run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S))" | tee -a "$SUMMARY"
  timeout 5400 "$@" > "/tmp/r4q2_${name}.log" 2>&1
  rc=$?
  grep -E '^\{|^TRUNKVAL_JSON|: .* ms/batch' "/tmp/r4q2_${name}.log" \
    | tail -12 >> "$SUMMARY" || true
  [ $rc -ne 0 ] && echo "[$name rc=$rc]" >> "$SUMMARY"
}

# 1. Serving-tail decomposition at HEAD (cached from the round-4 profile
#    run except the tail stages)
run tail_stages python tools/profile_serving.py \
    --roi-backend pallas_resident --stages postprocess,maskroi,full

# 2. bf16 match-trunk bench A/B (same session as the f32 79.68 reference;
#    re-run f32 first so the A/B shares chip conditions)
run bench_f32_trunk python bench.py
run bench_b16_trunk env SEAM_BENCH_TRUNK_DTYPE=bfloat16 python bench.py

# 3. resident kernel chunk-size probe (pure config A/B, no code change)
run roi_chunk2048 python tools/bench_roi_resident.py --chunk 2048
run roi_chunk4096 python tools/bench_roi_resident.py --chunk 4096

# 4. bf16-trunk retrieval gate (synthetic-trained, both harnesses)
run trunkval python tools/validate_trunk_dtype.py

echo "=== queue2 done $(date +%H:%M:%S)" >> "$SUMMARY"
