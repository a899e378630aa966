"""Stage-by-stage serving profiler (the tool behind PERF.md's breakdown).

Usage: python tools/profile_serving.py [--batch 11] [--iters 4]
Times cumulative pipeline prefixes inside one jit (scan + scalar fetch —
see PERF.md on why block_until_ready cannot be trusted here).
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=11)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--height", type=int, default=800)
    ap.add_argument("--width", type=int, default=1344)
    ap.add_argument("--roi-backend", default="xla",
                    choices=["xla", "pallas", "pallas_int8",
                             "pallas_resident"])
    ap.add_argument("--stages", default=None,
                    help="comma-separated subset of stages to time")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from seam_match_rcnn_tpu.config import ModelConfig, RoIHeadsConfig
    from seam_match_rcnn_tpu.models.detection import postprocess_detections
    from seam_match_rcnn_tpu.models.matchrcnn import init_model

    b, h, w = args.batch, args.height, args.width
    cfg = ModelConfig(
        roi_heads=RoIHeadsConfig(roi_align_backend=args.roi_backend)
    )
    model, variables = init_model(cfg, video=True, canvas=(256, 320))
    rng = np.random.RandomState(0)
    all_images = jnp.asarray(rng.rand(args.iters, b, h, w, 3).astype(np.float32))
    sizes = jnp.asarray([[h, min(w, 1333)]] * b, jnp.int32)

    def stage_fn(stage):
        def one(imgs):
            m = model.bind(variables)
            feats = m.features(imgs)
            if stage == "backbone":
                return sum(jnp.sum(f.astype(jnp.float32)) for f in feats)
            _, (props, scores, pvalid) = m.proposals(feats, sizes, training=False)
            if stage == "rpn+nms":
                return jnp.sum(props) + jnp.sum(scores)
            cl, bd = m.box_branch(feats, props)
            if stage == "boxbranch":
                return jnp.sum(cl) + jnp.sum(bd)
            det = postprocess_detections(
                cl, bd, props, pvalid, sizes.astype(jnp.float32),
                cfg.roi_heads, 0.1,
            )
            if stage == "postprocess":
                return jnp.sum(det.boxes) + jnp.sum(det.scores)
            roi = m.mask_roi(feats, det.boxes).astype(jnp.float32)
            if stage == "maskroi":
                return jnp.sum(roi)
            bb, d = det.boxes.shape[:2]
            desc = m.match_descriptors(roi.reshape(bb * d, 14, 14, -1))
            aggr = m.aggregator_descriptors(roi.reshape(bb * d, 14, 14, -1))
            return jnp.sum(desc) + jnp.sum(aggr)

        def loop(all_images):
            def body(acc, imgs):
                return acc + one(imgs), ()
            tot, _ = jax.lax.scan(body, jnp.float32(0), all_images)
            return tot

        return jax.jit(loop)

    all_stages = ["backbone", "rpn+nms", "boxbranch", "postprocess", "maskroi",
                  "full"]
    stages = all_stages
    if args.stages:
        stages = args.stages.split(",")
        unknown = sorted(set(stages) - set(all_stages))
        if unknown:
            ap.error(f"unknown stages {unknown}; choose from {all_stages}")
    for stage in stages:
        f = stage_fn(stage)
        float(f(all_images))  # compile + warm
        t0 = time.perf_counter()
        float(f(all_images))
        dt = time.perf_counter() - t0
        print(f"{stage}: {dt / args.iters * 1000:.1f} ms/batch "
              f"({b * args.iters / dt:.1f} fps)", flush=True)


if __name__ == "__main__":
    main()
