"""The serving roi mix shared by the RoIAlign tools.

One definition so the benchmark (bench_roi_resident), the host-side
run-structure analysis (analyze_resident_runs) and the kernel experiments
(exp_matmul_gate, exp_row_splits) all time/analyze the SAME distribution:
log-uniform box scale across the FPN band, anchor aspect ratios,
center-placed uniformly on the serving canvas with border clipping — the
recipe whose measurements PERF.md records.  Draw order is fixed
(a, s, cy, cx) so a given rng state reproduces the recorded rois.
"""

import numpy as np


def serving_roi_mix(rng, b, n, canvas=(800, 1344)):
    """[b*n, 4] xyxy float32 rois in image coordinates."""
    h, w = canvas
    a = np.asarray([0.5, 1.0, 2.0])[rng.randint(0, 3, b * n)] * np.exp(
        rng.randn(b * n) * 0.2)
    s = np.exp(rng.uniform(np.log(16.0), np.log(760.0), b * n))
    bh, bw = s * np.sqrt(a), s / np.sqrt(a)
    cy, cx = rng.uniform(0, h, b * n), rng.uniform(0, w, b * n)
    x1 = np.clip(cx - bw / 2, 0, w - 1)
    y1 = np.clip(cy - bh / 2, 0, h - 1)
    x2 = np.clip(cx + bw / 2, x1 + 1, w)
    y2 = np.clip(cy + bh / 2, y1 + 1, h)
    return np.stack([x1, y1, x2, y2], 1).astype(np.float32)
