#!/bin/bash
# Round-5 on-chip measurement queue #2 (VERDICT r4 #2/#7): the
# high-resolution retrieval-gate fixture (64 confusable products, top-1
# quantum 1.6%, rank-margin instrument) + the parity-gate rehearsal.
# Sequential; logs to /tmp/r5q2_<name>.log; summary to /tmp/r5q2_summary.txt.
cd /root/repo
SUMMARY=/tmp/r5q2_summary.txt
: > "$SUMMARY"

run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S))" | tee -a "$SUMMARY"
  timeout 9000 "$@" > "/tmp/r5q2_${name}.log" 2>&1
  rc=$?
  grep -E '^\{|_JSON ' "/tmp/r5q2_${name}.log" >> "$SUMMARY" || \
    echo "[$name rc=$rc — see /tmp/r5q2_${name}.log]" >> "$SUMMARY"
}

# Quick attribution + contract jobs first (minutes each):
# - adjoint microbench: is the ~111 ms of roi-branch backward really the
#   scatter-add? (decides the resident-adjoint kernel lever)
# - fused-stem Mosaic probes (round-5 constructions) + XLA stem reference
# - bench.py train profile (new one-line-JSON training metric)
run adjoint       python tools/bench_adjoint.py
run stem_probe    python tools/exp_stem_im2col.py
run bench_train_profile env SEAM_BENCH_PROFILE=train python bench.py

# 64-product confusable fixture: CONTROL (pallas vs pallas_resident, both
# bf16) sets the noise floor; int8 + fast-profile + trunk-dtype re-decided
# against it with per-flip margins.
run int8_64   python tools/validate_int8.py --products 64 --confusable
run fast_64   python tools/validate_fast_profile.py --products 64 --eval_products 64 --confusable
run trunk_64  python tools/validate_trunk_dtype.py --products 64 --confusable

# Parity-gate rehearsal at HEAD (VERDICT r4 #7): recipe must not rot.
run parity_rehearsal python tools/validate_parity.py --synthetic --small --fp16_gallery

echo "=== queue done $(date +%H:%M:%S)" >> "$SUMMARY"
