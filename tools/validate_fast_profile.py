"""Fast-profile (1000 post-NMS proposals) accuracy validation on synthetic
data at FULL serving geometry (VERDICT r1 #4 / r2 #5; PERF.md lever 1).

The fast profile cuts the box branch's RoIAlign work 4x (torchvision's
default 1000 post-NMS proposals instead of the reference's 4000,
/root/reference/models/matchrcnn.py:17-18) and measured +57% serving
throughput.  Its top-k drift cannot be validated on real data in this
environment; this tool produces the best available evidence instead:

  1. trains phase-1 Match R-CNN on a synthetic DeepFashion2 fixture at the
     REAL geometry (min side 800) until it detects the garments reliably
     (shared flow: tools/_synth_train.py);
  2. warm-starts the video model from that checkpoint (the reference
     load_saved_matchrcnn flow);
  3. runs the MovingFashion eval twice — serving profile (4000 proposals)
     vs fast profile (1000) — with IDENTICAL weights and kernels, so the
     only difference is the proposal-count knob;
  4. prints top-1 deltas for ALL SEVEN retrieval strategies.

Synthetic garments are easier than real data (high-contrast rectangles),
so a zero delta here is necessary but not sufficient; a NONZERO delta
would kill the default-flip outright.  Run on the TPU:

  python tools/validate_fast_profile.py [--products 8] [--epochs 6]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(__file__))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--products", type=int, default=16)
    ap.add_argument("--eval_products", type=int, default=16)
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--lr", type=float, default=0.001)
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--confusable", action="store_true",
                    help="near-pair palette (_synth_train.confusable_"
                    "palette): small retrieval margins so rank damage "
                    "can't hide inside a saturated top-1 table")
    args = ap.parse_args()

    import jax
    import numpy as np

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from _synth_train import (all_strategy_top1, confusable_palette,
                              margin_analysis, rank_margin_probe,
                              train_synthetic_phase1, video_vars)
    from seam_match_rcnn_tpu.cli.train_movingfashion import _eval_products
    from seam_match_rcnn_tpu.config import (EvalConfig,
                                            fast_eval_model_config,
                                            serving_model_config)
    from seam_match_rcnn_tpu.data.movingfashion import MovingFashionDataset
    from seam_match_rcnn_tpu.data.synthetic import make_synthetic_movingfashion
    from seam_match_rcnn_tpu.eval.movingfashion import evaluate
    from seam_match_rcnn_tpu.models.matchrcnn import init_model

    # one shared palette: the match head trains on and retrieves the SAME
    # product identities (color is the only retrieval signal in the
    # synthetic family; unseen colors evaluate at chance)
    palette_rng = np.random.RandomState(42)
    n_colors = max(args.products, args.eval_products)
    if args.confusable:
        palette = confusable_palette(n_colors)
    else:
        palette = [list(map(int, palette_rng.randint(64, 255, 3)))
                   for _ in range(n_colors)]
    trained, palette, root = train_synthetic_phase1(
        args.products, args.epochs, args.batch, args.lr,
        palette_colors=palette)

    mf_json = make_synthetic_movingfashion(
        os.path.join(root, "mf"), n_products=args.eval_products, n_frames=8,
        colors=palette)
    mf = MovingFashionDataset(mf_json, root=os.path.join(root, "mf"),
                              noise=True)

    results, mprobes = {}, {}
    for name, vcfg in (("serving", serving_model_config()),
                       ("fast", fast_eval_model_config())):
        vmodel, _ = init_model(vcfg, video=True,
                               canvas=vcfg.transform.landscape_canvas)
        vv = video_vars(vcfg, trained)
        out_dir = os.path.join(root, f"logs_{name}")
        evaluate(
            vmodel, vv,
            _eval_products(mf, args.frames, None),
            EvalConfig(frames_per_product=args.frames, first_n_withvideo=None),
            out_dir=out_dir,
        )
        results[name] = all_strategy_top1(out_dir)
        # full-fixture rank+margin instrument (VERDICT r4 #2)
        mprobes[name] = rank_margin_probe(
            vmodel, vv, _eval_products(mf, args.frames, None))
        print(f"[{name}] top-1 by strategy: {results[name]}")

    deltas = {k: results["fast"][k] - results["serving"][k]
              for k in results["serving"]}
    print("FASTVAL_JSON " + json.dumps(
        {"results": results, "deltas": deltas,
         "rank_margin_fast_vs_serving": margin_analysis(
             mprobes["serving"], mprobes["fast"]),
         "confusable": args.confusable,
         "products": args.eval_products, "frames": args.frames}))


if __name__ == "__main__":
    main()
