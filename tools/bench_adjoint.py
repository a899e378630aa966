"""RoIAlign ADJOINT microbenchmark (round-5 training-lever attribution).

The per-stage train profile (tools/profile_train.py, PERF.md round 5)
shows the box/mask branches' backwards at ~58/53 ms of the 250 ms step;
each contains a `multilevel_roi_align_adjoint` scatter-add of ~1.6M
bilinear sample rows (2048 rois x 196 samples x 4 corners at 7x7;
512 x 784 x 4 at 14x14).  This tool times the adjoint op ALONE at both
geometries so the lever decision (tile-resident Pallas adjoint vs keep)
rests on a measured number, not attribution arithmetic.

Usage: python tools/bench_adjoint.py [--iters 8]
Scan-fenced (PERF.md: block_until_ready does not fence on axon).
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--backend", default="xla", choices=["xla", "pallas"],
                    help="xla = exact scatter adjoint; pallas = the "
                    "resident-tile kernel (ops/pallas_roi_adjoint.py)")
    ap.add_argument("--precision", default="highest",
                    choices=["highest", "fast"],
                    help="pallas kernel matmul precision: highest = 6-pass "
                    "f32 (bit-matching summands); fast = single bf16 MXU "
                    "passes + f32 accumulation (the production rule for "
                    "bf16 features — mirrors the forward kernel)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from seam_match_rcnn_tpu.ops.pallas_roi_adjoint import (
        multilevel_roi_align_adjoint_pallas)
    from seam_match_rcnn_tpu.ops.roi_align import multilevel_roi_align_adjoint

    # training canvas 800x1344 -> P2..P5 shapes
    shapes = ((200, 336), (100, 168), (50, 84), (25, 42))
    rng = np.random.RandomState(0)

    def mix_rois(n):
        # anchor-shaped training roi mix across the canvas (same family as
        # tools/_mix.serving_roi_mix but per-image flat)
        s = rng.uniform(32, 512, (n,))
        ar = rng.choice([0.5, 1.0, 2.0], (n,))
        w = s * np.sqrt(ar)
        h = s / np.sqrt(ar)
        x1 = rng.uniform(0, 1344 - np.minimum(w, 1343))
        y1 = rng.uniform(0, 800 - np.minimum(h, 799))
        return np.stack([x1, y1, np.minimum(x1 + w, 1344),
                         np.minimum(y1 + h, 800)], -1).astype(np.float32)

    results = {}
    for name, n_per_img, out in (("box7", 512, 7), ("mask14", 128, 14)):
        n = args.batch * n_per_img
        if args.backend == "pallas":
            # the kernel is batched [B, R, ...]; the xla path is flat per
            # image (vmapped in production) — keep the EXACT production
            # call shapes for each
            rois = jnp.asarray(
                mix_rois(n).reshape(args.batch, n_per_img, 4))
            gs = jnp.asarray(rng.randn(
                args.iters, args.batch, n_per_img, out, out, 256
            ).astype(np.float32))

            def loop(gs, rois):
                def body(acc, g):
                    outs = multilevel_roi_align_adjoint_pallas(
                        g, rois, shapes, out,
                        highest=args.precision == "highest")
                    return acc + sum(jnp.sum(o) for o in outs), ()
                tot, _ = jax.lax.scan(body, jnp.float32(0), gs)
                return tot
        else:
            rois = jnp.asarray(mix_rois(n))
            gs = jnp.asarray(rng.randn(
                args.iters, n, out, out, 256).astype(np.float32))

            def loop(gs, rois):
                def body(acc, g):
                    outs = multilevel_roi_align_adjoint(
                        g, shapes, rois, out)
                    return acc + sum(jnp.sum(o) for o in outs), ()
                tot, _ = jax.lax.scan(body, jnp.float32(0), gs)
                return tot

        c = jax.jit(loop).lower(gs, rois).compile()
        float(c(gs, rois))
        t0 = time.perf_counter()
        float(c(gs, rois))
        dt = (time.perf_counter() - t0) / args.iters
        results[name] = round(dt * 1000, 2)
        print(f"adjoint {name}: {dt*1000:.2f} ms ({n} rois, "
              f"{n * out * out * 4 * 4} sample rows)", flush=True)

    print("ADJOINT_JSON " + json.dumps(
        {"metric": "roi_align_adjoint_ms", "batch": args.batch,
         "backend": args.backend, "precision": args.precision, **results}))


if __name__ == "__main__":
    main()
