"""Fast-profile (1000 post-NMS proposals) accuracy validation on synthetic
data at FULL serving geometry (VERDICT r1 #4 / PERF.md lever 1).

The fast profile cuts the box branch's RoIAlign work 4x (torchvision's
default 1000 post-NMS proposals instead of the reference's 4000,
/root/reference/models/matchrcnn.py:17-18) and measured +57% serving
throughput.  Its top-k drift cannot be validated on real data in this
environment; this tool produces the best available evidence instead:

  1. trains phase-1 Match R-CNN on a synthetic DeepFashion2 fixture at the
     REAL geometry (min side 800) until it detects the garments reliably;
  2. warm-starts the video model from that checkpoint (the reference
     load_saved_matchrcnn flow);
  3. runs the MovingFashion eval twice — serving profile (4000 proposals)
     vs fast profile (1000) — with IDENTICAL weights and kernels, so the
     only difference is the proposal-count knob;
  4. prints the top-1 deltas for every strategy.

Synthetic garments are easier than real data (high-contrast rectangles),
so a zero delta here is necessary but not sufficient; a NONZERO delta
would kill the default-flip outright.  Run on the TPU:

  python tools/validate_fast_profile.py [--products 8] [--epochs 6]
"""

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--products", type=int, default=16)
    ap.add_argument("--eval_products", type=int, default=16)
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--lr", type=float, default=0.001)
    ap.add_argument("--frames", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from seam_match_rcnn_tpu.config import (EvalConfig, ModelConfig,
                                            fast_eval_model_config,
                                            serving_model_config)
    from seam_match_rcnn_tpu.data import convert as conv
    from seam_match_rcnn_tpu.data.df2 import (DF2PairBatchSampler,
                                              DeepFashion2Dataset)
    from seam_match_rcnn_tpu.data.movingfashion import MovingFashionDataset
    from seam_match_rcnn_tpu.data.synthetic import (make_synthetic_df2,
                                                    make_synthetic_movingfashion)
    from seam_match_rcnn_tpu.data.transforms import Compose, ToArray
    from seam_match_rcnn_tpu.eval.movingfashion import evaluate
    from seam_match_rcnn_tpu.models.matchrcnn import init_model
    from seam_match_rcnn_tpu.train.engine import train_one_epoch_matchrcnn
    from seam_match_rcnn_tpu.train.optim import multistep_warmup_schedule, sgd
    from seam_match_rcnn_tpu.train.steps import (create_train_state,
                                                 make_phase1_grad_apply)
    from seam_match_rcnn_tpu.cli.train_movingfashion import _eval_products

    root = tempfile.mkdtemp(prefix="fastval_")
    # one shared palette: the match head trains on and retrieves the SAME
    # product identities (color is the only retrieval signal in the
    # synthetic family; unseen colors evaluate at chance)
    palette_rng = np.random.RandomState(42)
    n_colors = max(args.products, args.eval_products)
    palette = [list(map(int, palette_rng.randint(64, 255, 3)))
               for _ in range(n_colors)]
    img_dir, ann_dir = make_synthetic_df2(
        os.path.join(root, "df2"), n_products=args.products, views_per_side=2,
        image_size=(160, 200), colors=palette)
    ann = os.path.join(root, "df2", "annots.json")
    conv.convert(img_dir, ann_dir, ann)

    # ---- phase-1 training at REAL geometry (full transform); f32 compute:
    # from-scratch training in bf16 at this scale NaNs once warmup ends ----
    cfg = ModelConfig(compute_dtype="float32")  # exact XLA, differentiable
    model, variables = init_model(
        cfg, video=False, canvas=cfg.transform.landscape_canvas)
    ds = DeepFashion2Dataset(ann, img_dir, transforms=Compose([ToArray()]))
    sampler = DF2PairBatchSampler(ds, args.batch, seed=0)
    steps = max(len(sampler), 1)
    import optax

    # From-scratch full-geometry Mask R-CNN without an ImageNet backbone
    # diverges through the mask branch (the reference always warm-starts);
    # the tool only needs a working detector, so clip gradients — a tool
    # choice, not a training-recipe parity claim.
    tx = optax.chain(
        optax.clip_by_global_norm(5.0),
        sgd(multistep_warmup_schedule(
            args.lr, (max(args.epochs - 2, 1),), 0.1, steps,
            min(60, steps * (args.epochs - 1)), 1e-2), momentum=0.9))
    state = create_train_state(variables, tx)
    triple = make_phase1_grad_apply(model, tx)
    rng = jax.random.PRNGKey(0)

    def batches(epoch):
        sampler.set_epoch(epoch)
        for idxs in sampler:
            items = [ds[i] for i in idxs]
            yield ([i[0] for i in items], [i[1] for i in items],
                   [i[2] for i in items])

    for ep in range(args.epochs):
        state, rng = train_one_epoch_matchrcnn(
            model, state, triple, batches(ep), ep, rng, print_freq=4)
    trained = {"params": state.params, "batch_stats": state.batch_stats}

    # ---- video model warm-start (load_saved_matchrcnn semantics) ---------
    def video_vars(vcfg):
        _, base = init_model(vcfg, video=True,
                             canvas=vcfg.transform.landscape_canvas)
        params = dict(base["params"])
        stats = dict(base["batch_stats"])
        params.update({k: v for k, v in trained["params"].items()})
        stats.update({k: v for k, v in trained["batch_stats"].items()})
        ta = dict(params["temporal_aggregator"])
        ta["trunk"] = trained["params"]["match_predictor"]["trunk"]
        ta["last"] = trained["params"]["match_predictor"]["last"]
        params["temporal_aggregator"] = ta
        stats["temporal_aggregator"] = trained["batch_stats"]["match_predictor"]
        return {"params": params, "batch_stats": stats}

    # ---- eval fixture -----------------------------------------------------
    mf_json = make_synthetic_movingfashion(
        os.path.join(root, "mf"), n_products=args.eval_products, n_frames=8,
        colors=palette)
    mf = MovingFashionDataset(mf_json, root=os.path.join(root, "mf"),
                              noise=True)

    results = {}
    for name, vcfg in (("serving", serving_model_config()),
                       ("fast", fast_eval_model_config())):
        vmodel, _ = init_model(vcfg, video=True,
                               canvas=vcfg.transform.landscape_canvas)
        r1, r2, r3 = evaluate(
            vmodel, video_vars(vcfg),
            _eval_products(mf, args.frames, None),
            EvalConfig(frames_per_product=args.frames, first_n_withvideo=None),
            out_dir=os.path.join(root, f"logs_{name}"),
        )
        results[name] = {"top1_single": r1, "top1_avg_desc": r2,
                         "top1_aggr_desc": r3}
        print(f"[{name}] single/avg/aggr = {r1:.4f} {r2:.4f} {r3:.4f}")

    deltas = {k: results["fast"][k] - results["serving"][k]
              for k in results["serving"]}
    print("FASTVAL_JSON " + json.dumps(
        {"results": results, "deltas": deltas,
         "products": args.eval_products, "frames": args.frames}))


if __name__ == "__main__":
    main()
