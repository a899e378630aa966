"""bf16 match-trunk accuracy gate (PERF.md round 4 serving-tail lever).

``MatchHeadConfig.trunk_dtype="bfloat16"`` runs the match/aggregator conv
trunks (4 valid 3x3 convs per trunk — the FLOPs of the serving tail) in
bf16; pool/linear/BN/descriptors stay f32 (models/match_head.MatchTrunk).
Whether retrieval ranks survive the conv rounding was never measured; this
tool produces the evidence, mirroring tools/validate_int8.py:

  1. trains phase-1 Match R-CNN on a synthetic DF2 fixture at REAL
     geometry (shared flow, tools/_synth_train.py);
  2. warm-starts the video model (reference load_saved_matchrcnn);
  3. runs BOTH eval harnesses — MovingFashion (all 7 strategies) and
     MultiDF2 — under serving profiles differing ONLY in trunk_dtype;
  4. prints per-strategy top-1 deltas vs the f32 default.

Synthetic garments are easier than real data, so zero delta is necessary
but not sufficient; a NONZERO delta keeps the knob opt-in.  Scoring chain
protected: /root/reference/evaluate_movingfashion.py:94-121 (descriptors
feed the fp16 gallery math directly).

  python tools/validate_trunk_dtype.py [--products 16] [--epochs 8]
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
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--lr", type=float, default=0.001)
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--dtypes", nargs="+",
                    default=["float32", "bfloat16"])
    ap.add_argument("--confusable", action="store_true",
                    help="near-pair palette (_synth_train.confusable_"
                    "palette): small retrieval margins so rank damage "
                    "can't hide inside a saturated top-1 table")
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from _synth_train import (all_strategy_top1, compare_probes,
                              confusable_palette, descriptor_probe,
                              margin_analysis, rank_margin_probe,
                              train_synthetic_phase1, video_vars)
    from seam_match_rcnn_tpu.cli.train_movingfashion import _eval_products
    from seam_match_rcnn_tpu.cli.train_multidf2 import eval_products as mdf2_products
    from seam_match_rcnn_tpu.config import (EvalConfig, MatchHeadConfig,
                                            serving_model_config)
    from seam_match_rcnn_tpu.data import convert as conv
    from seam_match_rcnn_tpu.data.movingfashion import MovingFashionDataset
    from seam_match_rcnn_tpu.data.multidf2 import MultiDeepFashion2Dataset
    from seam_match_rcnn_tpu.data.synthetic import (
        make_synthetic_df2, make_synthetic_movingfashion)
    from seam_match_rcnn_tpu.eval.movingfashion import evaluate as eval_mf
    from seam_match_rcnn_tpu.eval.multidf2 import evaluate as eval_mdf2
    from seam_match_rcnn_tpu.models.matchrcnn import init_model

    trained, palette, root = train_synthetic_phase1(
        args.products, args.epochs, args.batch, args.lr,
        palette_colors=(confusable_palette(args.products)
                        if args.confusable else None))

    mf_json = make_synthetic_movingfashion(
        os.path.join(root, "mf"), n_products=args.products, n_frames=8,
        colors=palette)
    mf = MovingFashionDataset(mf_json, root=os.path.join(root, "mf"),
                              noise=True)
    mroot = os.path.join(root, "mdf2")
    img_dir, ann_dir = make_synthetic_df2(
        mroot, n_products=args.products, views_per_side=2,
        image_size=(160, 200), colors=palette)
    ann = os.path.join(mroot, "annots.json")
    conv.convert(img_dir, ann_dir, ann)

    # fixed probe set for sub-quantum drift stats (see validate_int8.py)
    probe_images = []
    for k, prod in enumerate(_eval_products(mf, args.frames, None)):
        probe_images.extend(prod["images"])
        if k >= 1:
            break

    results, probes, mprobes = {}, {}, {}
    for dt in args.dtypes:
        vcfg = serving_model_config(
            match=MatchHeadConfig(nlb_backend="pallas", trunk_dtype=dt))
        vmodel, _ = init_model(vcfg, video=True,
                               canvas=vcfg.transform.landscape_canvas)
        vv = video_vars(vcfg, trained)
        out_mf = os.path.join(root, f"logs_mf_{dt}")
        eval_mf(vmodel, vv, _eval_products(mf, args.frames, None),
                EvalConfig(frames_per_product=args.frames,
                           first_n_withvideo=None),
                out_dir=out_mf)
        mf_top1 = all_strategy_top1(out_mf)

        mds = MultiDeepFashion2Dataset(ann, img_dir, filter_onestreet=True)
        out_md = os.path.join(root, f"logs_mdf2_{dt}")
        eval_mdf2(vmodel, vv, mdf2_products(mds, args.frames, None),
                  EvalConfig(score_threshold=0.0, tracking_threshold=0.7,
                             frames_per_product=args.frames,
                             first_n_withvideo=None),
                  out_dir=out_md)
        md_top1 = all_strategy_top1(out_md)
        results[dt] = {"mf": mf_top1, "mdf2": md_top1}
        probes[dt] = descriptor_probe(vmodel, vv, probe_images)
        # full-fixture rank+margin instrument (VERDICT r4 #2)
        mprobes[dt] = rank_margin_probe(
            vmodel, vv, _eval_products(mf, args.frames, None))
        print(f"[{dt}] MF top-1: {mf_top1}")
        print(f"[{dt}] MDF2 top-1: {md_top1}")

    base = args.dtypes[0]
    drift = {dt: compare_probes(probes[dt], probes[base])
             for dt in args.dtypes[1:]}
    margins = {dt: margin_analysis(mprobes[base], mprobes[dt])
               for dt in args.dtypes[1:]}
    deltas = {
        dt: {ds: {s: results[dt][ds][s] - results[base][ds].get(s, 0.0)
                  for s in results[dt][ds]}
             for ds in results[dt]}
        for dt in args.dtypes[1:]
    }
    print("TRUNKVAL_JSON " + json.dumps(
        {"results": results, "deltas_vs_" + base: deltas,
         "probe_drift_vs_" + base: drift,
         "rank_margin_vs_" + base: margins,
         "confusable": args.confusable,
         "products": args.products, "frames": args.frames}))


if __name__ == "__main__":
    main()
