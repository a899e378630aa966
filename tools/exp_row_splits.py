"""Experiment: finer row-gating splits in the RoIAlign patch DMA.

The production kernel transfers rows [0, 24) unconditionally and [24, 40)
only when the roi's footprint reaches them (~55% of serving rois skip it,
PERF.md).  Footprints span ~[17, 31) rows for square boxes, so a smaller
unconditional piece could skip more bytes for small rois — at the cost of
one extra DMA issue per roi.  This times the PRODUCTION kernel at serving
geometry under different split tuples.

Usage: python tools/exp_row_splits.py [--splits "24;16,28;16;28"]
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=11)
    ap.add_argument("--rois", type=int, default=4000)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--splits", type=str, default="24;16;16,28;28;16,24,32")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from seam_match_rcnn_tpu.ops.pallas_roi_align import pallas_roi_align_batched

    rng = np.random.RandomState(0)
    b = args.batch
    shapes = [(200, 336), (100, 168), (50, 84), (25, 42)]
    feats = [jnp.asarray(rng.randn(b, h, w, 256).astype(np.float32),
                         jnp.bfloat16) for h, w in shapes]

    # the shared serving roi mix (draw-order identical to the inline
    # construction these numbers were recorded with)
    from _mix import serving_roi_mix

    n = args.rois
    rois = jnp.asarray(serving_roi_mix(rng, b, n).reshape(b, n, 4))
    roi_seq = jnp.stack([rois + i for i in range(args.iters)])

    results = {}
    baseline = None
    for spec in args.splits.split(";"):
        splits = tuple(int(x) for x in spec.split(",") if x)

        def run(feats, roi_seq, splits=splits):
            def body(acc, r):
                out = pallas_roi_align_batched(
                    feats, r, 7, 2, interpret=False, splits=splits)
                return acc + jnp.sum(out[:, ::97, 0, 0, 0]), ()
            total, _ = jax.lax.scan(body, jnp.float32(0), roi_seq)
            return total

        jrun = jax.jit(run)
        out1 = float(jrun(feats, roi_seq))  # compile + warm
        t0 = time.perf_counter()
        out2 = float(jrun(feats, roi_seq))
        dt = time.perf_counter() - t0
        assert np.isfinite(out2) and abs(out1 - out2) < 1e-3 * max(abs(out1), 1)
        if baseline is None:
            baseline = out1
        else:
            # all variants must compute the same thing
            assert abs(out1 - baseline) < 1e-2 * max(abs(baseline), 1), (
                spec, out1, baseline)
        us_per_roi = dt / (args.iters * b * n) * 1e6
        results[spec] = us_per_roi
        print(f"splits=({spec}): {dt * 1e3:.1f} ms "
              f"-> {us_per_roi:.3f} us/roi")

    best = min(results, key=results.get)
    print(f"best: splits=({best}) at {results[best]:.3f} us/roi "
          f"(baseline 24: {results.get('24', float('nan')):.3f})")


if __name__ == "__main__":
    main()
