"""End-to-end TRAINING-EPOCH throughput with the host data pipeline in the
loop (VERDICT r4 #4).

Every training number in PERF.md before round 5 was measured on
device-resident synthetic batches; this tool measures what a user gets:
jpeg/video decode + transforms + canvas padding on the host feeding the
jitted steps, through the real epoch engines.

  --phase 1  phase-1 supervised epoch (train/engine.train_one_epoch_matchrcnn
             + steps.Phase1Trainer) over an on-disk synthetic DeepFashion2
             fixture; reports images/sec.  Replaces the reference's torch
             DataLoader workers (/root/reference/datasets/DF2Dataset.py:194-204).
  --phase 2  phase-2 SEAM epoch (train_one_epoch_movingfashion: frozen-
             detector inference + host row selection + head step) over a
             synthetic MovingFashion fixture with real mp4 decode; reports
             products/sec.  Replaces /root/reference/datasets/MFDataset.py:59-97.

The optimizer runs at lr=0 (same compute, bit-stable): this is a
throughput instrument, not a training run — from-scratch full-geometry
training diverges without an ImageNet warm start (PERF.md round 2).

Epoch 1 warms the compile cache; epoch 2 is the measurement.
``--prefetch-depth 0`` serializes decode with the device step for the A/B.
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, ".")


def phase1(args):
    import jax
    import numpy as np

    from seam_match_rcnn_tpu.config import RoIHeadsConfig, serving_model_config
    import dataclasses

    from seam_match_rcnn_tpu.data import convert as conv
    from seam_match_rcnn_tpu.data.df2 import (DF2PairBatchSampler,
                                              DeepFashion2Dataset)
    from seam_match_rcnn_tpu.data.prefetch import prefetch
    from seam_match_rcnn_tpu.data.synthetic import make_synthetic_df2
    from seam_match_rcnn_tpu.data.transforms import (Compose,
                                                     RandomHorizontalFlip,
                                                     ToArray)
    from seam_match_rcnn_tpu.models.matchrcnn import init_model
    from seam_match_rcnn_tpu.train.engine import train_one_epoch_matchrcnn
    from seam_match_rcnn_tpu.train.optim import (backbone_frozen_mask,
                                                 multistep_warmup_schedule,
                                                 sgd)
    from seam_match_rcnn_tpu.train.steps import (Phase1Trainer,
                                                 create_train_state)

    root = tempfile.mkdtemp(prefix="bench_epoch_df2_")
    # 600x800 sources resize (min side -> 800) onto the 800x1344 landscape
    # canvas — the same static device geometry as tools/bench_train.py, so
    # the epoch rate is directly comparable to the device-only step rate
    img_dir, ann_dir = make_synthetic_df2(
        root, n_products=args.products, views_per_side=2,
        image_size=(600, 800))
    ann = os.path.join(root, "annots.json")
    conv.convert(img_dir, ann_dir, ann)

    cfg = serving_model_config(
        roi_heads=RoIHeadsConfig(roi_align_backend=args.roi_backend))
    cfg = dataclasses.replace(cfg, freeze_backbone_stages=not args.no_freeze)
    dataset = DeepFashion2Dataset(
        ann, img_dir,
        transforms=Compose([ToArray(), RandomHorizontalFlip(0.5)]))
    sampler = DF2PairBatchSampler(dataset, args.batch, seed=0)
    model, variables = init_model(cfg, video=False)
    tx = sgd(multistep_warmup_schedule(0.0, (6, 9), 0.1,
                                       max(len(sampler), 2), 0, 1e-3),
             momentum=0.9,
             trainable_mask=None if args.no_mask else backbone_frozen_mask)
    state = create_train_state(variables, tx)
    trainer = Phase1Trainer(model, tx)
    rng = jax.random.PRNGKey(0)

    def batches(epoch):
        sampler.set_epoch(epoch)
        for idxs in sampler:
            items = [dataset[i] for i in idxs]
            yield ([i[0] for i in items], [i[1] for i in items],
                   [i[2] for i in items])

    n_images = len(sampler) * args.batch
    times = []
    for ep in range(2):
        data = batches(ep)
        if args.prefetch_depth > 0:
            data = prefetch(data, depth=args.prefetch_depth)
        t0 = time.perf_counter()
        state, rng = train_one_epoch_matchrcnn(
            model, state, trainer, data, ep, rng, print_freq=1000)
        # engine steps are host-chained; state fetch fences the epoch
        float(np.asarray(jax.tree.leaves(state.params)[0]).ravel()[0])
        times.append(time.perf_counter() - t0)
        if args.prefetch_depth > 0:
            data.close()
        print(f"epoch {ep}: {times[-1]:.1f}s "
              f"({n_images / times[-1]:.2f} img/s)", flush=True)

    print(json.dumps({
        "metric": "phase1_epoch_throughput_e2e",
        "value": round(n_images / times[-1], 3),
        "unit": "images/sec (host pipeline + device step)",
        "n_images": n_images,
        "batch": args.batch,
        "prefetch_depth": args.prefetch_depth,
        "roi_backend": args.roi_backend,
        "compile_epoch_s": round(times[0], 1),
    }))


def phase2(args):
    import jax
    import numpy as np

    from seam_match_rcnn_tpu.config import serving_model_config
    from seam_match_rcnn_tpu.data.movingfashion import (MovingFashionDataset,
                                                        product_batches)
    from seam_match_rcnn_tpu.data.prefetch import prefetch
    from seam_match_rcnn_tpu.data.synthetic import (
        make_synthetic_movingfashion)
    from seam_match_rcnn_tpu.eval.runner import InferenceRunner
    from seam_match_rcnn_tpu.models.matchrcnn import init_model
    from seam_match_rcnn_tpu.train.engine import (
        train_one_epoch_movingfashion)
    from seam_match_rcnn_tpu.train.optim import sgd
    from seam_match_rcnn_tpu.train.seam import (create_head_state,
                                                make_seam_head_step,
                                                merge_head_state)

    root = tempfile.mkdtemp(prefix="bench_epoch_mf_")
    annots = make_synthetic_movingfashion(
        root, n_products=args.products, n_frames=args.frames + 2,
        frame_size=(600, 800))
    ds = MovingFashionDataset(annots, root=root, noise=True)
    cfg = serving_model_config()
    model, variables = init_model(cfg, video=True)
    tx = sgd(lambda s: 0.0, momentum=0.9)
    head_state = create_head_state(variables, tx)
    head_step = make_seam_head_step(tx, frames_per_product=args.frames,
                                    n_frames=cfg.match.n_frames)

    times = []
    for ep in range(2):
        runner = InferenceRunner(
            model, merge_head_state(variables, head_state),
            chunk=args.chunk, with_match=False, with_aggr_features=False,
            with_roi_features=True)
        data = product_batches(ds, args.shops, args.frames, seed=0,
                               epoch=ep, drop_last=True)
        if args.prefetch_depth > 0:
            data = prefetch(data, depth=args.prefetch_depth)
        t0 = time.perf_counter()
        head_state = train_one_epoch_movingfashion(
            model, variables, head_state, head_step, runner, data, ep,
            args.shops, args.frames, score_thresh=0.0, print_freq=1000)
        float(np.asarray(
            jax.tree.leaves(head_state.params)[0]).ravel()[0])
        times.append(time.perf_counter() - t0)
        if args.prefetch_depth > 0:
            data.close()
        n_batches = len(ds) // args.shops
        prods = n_batches * args.shops
        print(f"epoch {ep}: {times[-1]:.1f}s "
              f"({prods / times[-1]:.2f} products/s)", flush=True)

    n_batches = len(ds) // args.shops
    prods = n_batches * args.shops
    print(json.dumps({
        "metric": "phase2_epoch_throughput_e2e",
        "value": round(prods / times[-1], 3),
        "unit": "products/sec (video decode + frozen inference + head step)",
        "images_per_sec": round(prods * (1 + args.frames) / times[-1], 2),
        "products": prods,
        "shops_per_batch": args.shops,
        "frames_per_product": args.frames,
        "prefetch_depth": args.prefetch_depth,
        "compile_epoch_s": round(times[0], 1),
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", type=int, choices=[1, 2], required=True)
    ap.add_argument("--products", type=int, default=16)
    ap.add_argument("--batch", type=int, default=4, help="phase-1 batch")
    ap.add_argument("--prefetch-depth", type=int, default=2)
    ap.add_argument("--roi-backend", default="pallas_resident")
    ap.add_argument("--no-mask", action="store_true")
    ap.add_argument("--no-freeze", action="store_true")
    ap.add_argument("--shops", type=int, default=4,
                    help="phase-2 products per batch")
    ap.add_argument("--frames", type=int, default=10,
                    help="phase-2 street frames per product")
    ap.add_argument("--chunk", type=int, default=15,
                    help="phase-2 inference chunk")
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    (phase1 if args.phase == 1 else phase2)(args)


if __name__ == "__main__":
    main()
