#!/bin/bash
# Pending TPU validation queue (run when the axon tunnel is reachable).
# Each step logs to /tmp/tpuq_*.log; the script is safe to re-run — every
# step is read-only w.r.t. the repo and uses the persistent compile cache.
#
# Queue (round-2 resident-RoIAlign follow-through, PERF.md "on-chip
# confirmation pending"):
#   1. resident-vs-patch-DMA A/B at the serving mix (post branch-hoist)
#   2. single-tile isolation (per-roi floor without tile logistics)
#   3. compiled e2e parity: pallas_resident model backend vs exact XLA
#   4. compiled kernel regression tests (pytest -m tpu)
#   5. bench.py with the production backend (headline number at HEAD)
set -u
cd /root/repo

echo "== 1. resident A/B (serving mix) =="
timeout 3600 python tools/bench_roi_resident.py --iters 4 \
    2>&1 | tee /tmp/tpuq_resident_ab.log | tail -20

echo "== 2. resident single-tile floor =="
timeout 1800 python tools/bench_roi_resident.py --single-tile --iters 4 \
    2>&1 | tee /tmp/tpuq_resident_single.log | tail -10

echo "== 3. compiled e2e parity (resident backend) =="
timeout 3600 python tools/drive_resident_e2e.py \
    2>&1 | tee /tmp/tpuq_drive_resident.log | tail -10

echo "== 4. compiled kernel regressions =="
SEAM_TEST_TPU=1 timeout 3600 python -m pytest tests/ -m tpu -q \
    2>&1 | tee /tmp/tpuq_pytest_tpu.log | tail -5

echo "== 5. bench at HEAD (production patch-DMA backend) =="
timeout 5400 python bench.py 2>&1 | tee /tmp/tpuq_bench.log | tail -3

echo "== 6. bench A/B with the resident backend =="
SEAM_BENCH_ROI_BACKEND=pallas_resident timeout 5400 python bench.py \
    2>&1 | tee /tmp/tpuq_bench_resident.log | tail -3

echo "== queue done =="
