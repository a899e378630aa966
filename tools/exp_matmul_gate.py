"""Experiment: footprint-gated pooling-matmul K in the RoIAlign kernel.

The tail-DMA gating (rows [24, 40) move only when the footprint reaches
them) leaves the pooling matmul at full K = PATCH*PATCH_W = 1920 for every
roi even though wy's columns past the footprint are zero.  ~55% of serving
rois fit in 24 rows; giving them a K = 24*48 = 1152 matmul (and a 24-piece
wc expansion) removes MXU and VPU work above the kernel's DMA floor.

A/B at serving geometry: gate_matmul True vs False, identical outputs.

Usage: python tools/exp_matmul_gate.py [--rois 4000] [--iters 4]
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

    outs = {}
    for gate in (False, True):

        def run(feats, roi_seq, gate=gate):
            def body(acc, r):
                out = pallas_roi_align_batched(
                    feats, r, 7, 2, interpret=False, gate_matmul=gate)
                return acc + jnp.sum(out[:, ::97, 0, 0, 0]), ()
            total, _ = jax.lax.scan(body, jnp.float32(0), roi_seq)
            return total

        jrun = jax.jit(run)
        out1 = float(jrun(feats, roi_seq))  # compile + warm
        t0 = time.perf_counter()
        out2 = float(jrun(feats, roi_seq))
        dt = time.perf_counter() - t0
        assert np.isfinite(out2) and abs(out1 - out2) < 1e-3 * max(abs(out1), 1)
        outs[gate] = (out1, dt)
        us = dt / (args.iters * b * n) * 1e6
        print(f"gate_matmul={gate}: {dt * 1e3:.1f} ms -> {us:.3f} us/roi")

    # both variants must compute the same thing
    assert abs(outs[True][0] - outs[False][0]) < 1e-2 * max(
        abs(outs[False][0]), 1), outs
    speedup = outs[False][1] / outs[True][1]
    print(f"speedup from matmul gating: {speedup:.3f}x")


if __name__ == "__main__":
    main()
