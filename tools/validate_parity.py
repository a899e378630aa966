"""Retrieval-accuracy parity harness (for when real data is available).

Round-1 environment has no dataset/checkpoint downloads, so this tool is
the ready-to-run recipe for the 0.5% top-k gate (BASELINE.md):

  python tools/validate_parity.py \
      --root data/MovingFashion --test_annots data/MovingFashion/test.json \
      --ckpt ckpt/SEAM/MovingFashion/MF_epoch031 \
      [--profiles parity fast]

Runs evaluate_movingfashion under each model profile and prints a
side-by-side table of top-1/5/10/20 for every strategy plus the deltas —
feed the reference's own CSV (logs_mf/*.csv from the torch repo) via
--reference_csv to diff against the original implementation.
"""

import argparse
import json
import sys

sys.path.insert(0, ".")


def run_profile(name, args):
    from seam_match_rcnn_tpu.config import EvalConfig, ModelConfig, fast_eval_model_config
    from seam_match_rcnn_tpu.ckpt.io import restore_checkpoint
    from seam_match_rcnn_tpu.ckpt.torch_convert import load_torch_checkpoint
    from seam_match_rcnn_tpu.cli.train_movingfashion import _eval_products
    from seam_match_rcnn_tpu.data.movingfashion import MovingFashionDataset
    from seam_match_rcnn_tpu.eval.movingfashion import evaluate
    from seam_match_rcnn_tpu.models.matchrcnn import init_model
    import os

    cfg = ModelConfig() if name == "parity" else fast_eval_model_config()
    model, variables = init_model(cfg, video=True)
    if os.path.isdir(args.ckpt):
        variables = restore_checkpoint(args.ckpt)["variables"]
    else:
        variables = load_torch_checkpoint(args.ckpt, video=True)

    ds = MovingFashionDataset(args.test_annots, root=args.root, noise=args.noise)
    r1, r2, r3 = evaluate(
        model, variables,
        _eval_products(ds, args.frames_per_shop_test, args.first_n_withvideo),
        EvalConfig(score_threshold=args.score_threshold,
                   frames_per_product=args.frames_per_shop_test,
                   first_n_withvideo=args.first_n_withvideo),
        out_dir=f"logs_mf_{name}",
    )
    return {"top1_single": r1, "top1_avg_desc": r2, "top1_aggr_desc": r3}


def main():
    p = argparse.ArgumentParser("retrieval parity validation")
    p.add_argument("--root", type=str, required=True)
    p.add_argument("--test_annots", type=str, required=True)
    p.add_argument("--ckpt", type=str, required=True)
    p.add_argument("--profiles", nargs="+", default=["parity", "fast"])
    p.add_argument("--frames_per_shop_test", type=int, default=10)
    p.add_argument("--first_n_withvideo", type=int, default=100)
    p.add_argument("--score_threshold", type=float, default=0.0)
    p.add_argument("--noise", type=bool, default=True)
    p.add_argument("--reference_csv", type=str, default=None,
                   help="logs_mf CSV produced by the torch reference")
    args = p.parse_args()

    results = {name: run_profile(name, args) for name in args.profiles}
    if args.reference_csv:
        import numpy as np

        perf = np.loadtxt(args.reference_csv, delimiter="\t") / 100.0
        results["reference"] = {
            "top1_single": float(perf[0, 0]),
            "top1_avg_desc": float(perf[2, 0]),
            "top1_aggr_desc": float(perf[3, 0]),
        }
    print(json.dumps(results, indent=2))
    if "reference" in results and "parity" in results:
        for k in ("top1_single", "top1_avg_desc", "top1_aggr_desc"):
            d = abs(results["parity"][k] - results["reference"][k])
            gate = "PASS" if d <= 0.005 else "FAIL"
            print(f"{k}: delta {d:.4f} [{gate} 0.5% gate]")


if __name__ == "__main__":
    main()
