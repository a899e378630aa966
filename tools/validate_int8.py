"""pallas_int8 accuracy gate (VERDICT r2 #6): measured retrieval deltas.

The int8 profile quantizes the feature pyramid AND the pooling operator to
int8 (int8×int8 MXU matmuls) — descriptor drift up to ~0.25 max-abs on
O(1)-magnitude descriptors vs bf16 (README parity notes).  Whether ranks
survive that drift was never measured; this tool produces the evidence:

  1. trains phase-1 Match R-CNN on a synthetic DF2 fixture at REAL
     geometry (shared flow with tools/validate_fast_profile.py);
  2. warm-starts the video model (reference load_saved_matchrcnn);
  3. runs BOTH eval harnesses — MovingFashion (all 7 strategies) and
     MultiDF2 — under serving profiles that differ ONLY in the RoIAlign
     backend: pallas_resident (bf16 serving default), pallas (bf16
     patch-DMA), pallas_int8;
  4. prints per-strategy top-1 deltas vs the bf16 default.

Synthetic garments are easier than real data, so zero delta is necessary
but not sufficient; a NONZERO delta kills the int8 profile outright.

  python tools/validate_int8.py [--products 16] [--epochs 8]
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
    ap.add_argument("--backends", nargs="+",
                    default=["pallas_resident", "pallas", "pallas_int8"])
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
    from seam_match_rcnn_tpu.config import (EvalConfig, RoIHeadsConfig,
                                            serving_model_config)
    from seam_match_rcnn_tpu.data import convert as conv
    from seam_match_rcnn_tpu.data.movingfashion import MovingFashionDataset
    from seam_match_rcnn_tpu.data.synthetic import (
        make_synthetic_df2, make_synthetic_movingfashion)
    from seam_match_rcnn_tpu.eval.movingfashion import evaluate as eval_mf
    from seam_match_rcnn_tpu.eval.multidf2 import evaluate as eval_mdf2
    from seam_match_rcnn_tpu.models.matchrcnn import init_model

    trained, palette, root = train_synthetic_phase1(
        args.products, args.epochs, args.batch, args.lr,
        palette_colors=(confusable_palette(args.products)
                        if args.confusable else None))

    # ---- eval fixtures (same palette: color identity is the synthetic
    # family's retrieval signal) -------------------------------------------
    mf_json = make_synthetic_movingfashion(
        os.path.join(root, "mf"), n_products=args.products, n_frames=8,
        colors=palette)
    mf = MovingFashionDataset(mf_json, root=os.path.join(root, "mf"),
                              noise=True)
    # MultiDF2-style fixture: reuse the DF2 images as street/shop products
    # (the eval only needs boxes/styles/pair_ids per image)
    mroot = os.path.join(root, "mdf2")
    img_dir, ann_dir = make_synthetic_df2(
        mroot, n_products=args.products, views_per_side=2,
        image_size=(160, 200), colors=palette)
    ann = os.path.join(mroot, "annots.json")
    conv.convert(img_dir, ann_dir, ann)

    # fixed probe set for the sub-quantum drift stats (PERF.md round 4:
    # top-1 flips bottom out at the ±1-product noise floor; descriptor/
    # score drift separates backend rounding from real rank damage)
    probe_images = []
    for k, prod in enumerate(_eval_products(mf, args.frames, None)):
        probe_images.extend(prod["images"])
        if k >= 1:
            break

    results, probes, mprobes = {}, {}, {}
    for backend in args.backends:
        vcfg = serving_model_config(
            roi_heads=RoIHeadsConfig(roi_align_backend=backend))
        vmodel, _ = init_model(vcfg, video=True,
                               canvas=vcfg.transform.landscape_canvas)
        vv = video_vars(vcfg, trained)
        out_mf = os.path.join(root, f"logs_mf_{backend}")
        eval_mf(vmodel, vv, _eval_products(mf, args.frames, None),
                EvalConfig(frames_per_product=args.frames,
                           first_n_withvideo=None),
                out_dir=out_mf)
        mf_top1 = all_strategy_top1(out_mf)

        from seam_match_rcnn_tpu.data.multidf2 import MultiDeepFashion2Dataset
        mds = MultiDeepFashion2Dataset(ann, img_dir, filter_onestreet=True)
        out_md = os.path.join(root, f"logs_mdf2_{backend}")
        eval_mdf2(vmodel, vv, mdf2_products(mds, args.frames, None),
                  EvalConfig(score_threshold=0.0, tracking_threshold=0.7,
                             frames_per_product=args.frames,
                             first_n_withvideo=None),
                  out_dir=out_md)
        md_top1 = all_strategy_top1(out_md)
        results[backend] = {"mf": mf_top1, "mdf2": md_top1}
        probes[backend] = descriptor_probe(vmodel, vv, probe_images)
        # full-fixture rank+margin instrument (VERDICT r4 #2): separates
        # rounding flips from real rank damage via top1/runner-up margins
        mprobes[backend] = rank_margin_probe(
            vmodel, vv, _eval_products(mf, args.frames, None))
        print(f"[{backend}] MF top-1: {mf_top1}")
        print(f"[{backend}] MDF2 top-1: {md_top1}")

    base = args.backends[0]
    drift = {bk: compare_probes(probes[bk], probes[base])
             for bk in args.backends[1:]}
    margins = {bk: margin_analysis(mprobes[base], mprobes[bk])
               for bk in args.backends[1:]}
    deltas = {
        bk: {ds: {s: results[bk][ds][s] - results[base][ds].get(s, 0.0)
                  for s in results[bk][ds]}
             for ds in results[bk]}
        for bk in args.backends[1:]
    }
    print("INT8VAL_JSON " + json.dumps(
        {"results": results, "deltas_vs_" + base: deltas,
         "probe_drift_vs_" + base: drift,
         "rank_margin_vs_" + base: margins,
         "confusable": args.confusable,
         "products": args.products, "frames": args.frames}))


if __name__ == "__main__":
    main()
