"""Microbench: Pallas RoIAlign bf16 vs int8-compressed pyramid on the TPU.

The patch-DMA kernel is HBM-bandwidth-bound at ~80% of the measured device
ceiling (PERF.md); per-channel int8 quantization of the FPN pyramid halves
the DMA bytes.  This tool measures both variants at the serving geometry
(11 images x 4000 proposals, 7x7, 256 ch) and checks numerical drift.

Usage: python tools/bench_roi_int8.py [--batch 11] [--rois 4000] [--iters 4]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=11)
    ap.add_argument("--rois", type=int, default=4000)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--channels", type=int, default=256)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from seam_match_rcnn_tpu.ops.pallas_roi_align import (
        pallas_roi_align_batched,
        quantize_features_int8,
    )

    b, r, c = args.batch, args.rois, args.channels
    shapes = [(200, 336), (100, 168), (50, 84), (25, 42)]
    rng = np.random.RandomState(0)
    feats = [
        jnp.asarray(rng.randn(b, h, w, c).astype(np.float32), jnp.bfloat16)
        for h, w in shapes
    ]
    # serving-like roi mix: post-NMS proposals skew small, so most map to
    # P2 (sqrt-area < 112 at the level mapper) — the big, cache-unfriendly
    # level where the patch DMA is genuinely HBM-bound
    side = np.exp(rng.uniform(np.log(30), np.log(250), size=(args.iters, b, r)))
    a = rng.uniform(0.55, 1.8, size=(args.iters, b, r))
    bw = np.minimum(side * np.sqrt(a), 1340.0)
    bh = np.minimum(side / np.sqrt(a), 798.0)
    x1 = rng.uniform(0, 1, size=bw.shape) * (1344 - bw)
    y1 = rng.uniform(0, 1, size=bw.shape) * (800 - bh)
    all_rois = jnp.asarray(
        np.stack([x1, y1, x1 + bw, y1 + bh], -1).astype(np.float32)
    )

    def run_bf16(feats, rois_seq):
        def body(acc, rois):
            out = pallas_roi_align_batched(feats, rois, 7, 2)
            return acc + jnp.sum(out), ()
        tot, _ = jax.lax.scan(body, jnp.float32(0), rois_seq)
        return tot

    def run_int8(feats, rois_seq):
        qs, scales = quantize_features_int8(feats)
        def body(acc, rois):
            out = pallas_roi_align_batched(qs, rois, 7, 2, scales=scales)
            return acc + jnp.sum(out), ()
        tot, _ = jax.lax.scan(body, jnp.float32(0), rois_seq)
        return tot

    for name, fn in [("bf16", run_bf16), ("int8", run_int8)]:
        f = jax.jit(fn)
        float(f(feats, all_rois))  # compile + warm
        t0 = time.perf_counter()
        float(f(feats, all_rois))
        dt = (time.perf_counter() - t0) / args.iters
        n = b * r
        print(f"{name}: {dt*1e3:8.1f} ms / {n} rois  ({dt/n*1e6:.2f} us/roi)")

    # drift check on one batch
    out_b = jax.jit(
        lambda fs, ro: pallas_roi_align_batched(fs, ro, 7, 2)
    )(feats, all_rois[0])
    qs, scales = jax.jit(quantize_features_int8)(feats)
    out_q = jax.jit(
        lambda qs, ro, sc: pallas_roi_align_batched(qs, ro, 7, 2, scales=sc)
    )(qs, all_rois[0], scales)
    d = jnp.max(jnp.abs(out_b - out_q)) / (jnp.max(jnp.abs(out_b)) + 1e-9)
    print(f"max rel drift vs bf16 pallas: {float(d):.5f}")


if __name__ == "__main__":
    main()
