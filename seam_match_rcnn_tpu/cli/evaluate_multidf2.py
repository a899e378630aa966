"""Eval CLI: MultiDeepFashion2 retrieval
(mirrors /root/reference/evaluate_multiDF2.py __main__ :330-389)."""

from __future__ import annotations

import argparse
import os

from ..config import EvalConfig, ModelConfig, serving_model_config
from ..ckpt.io import restore_checkpoint
from ..ckpt.torch_convert import load_torch_checkpoint
from ..data.multidf2 import MultiDeepFashion2Dataset
from ..eval.multidf2 import evaluate
from ..models.matchrcnn import init_model
from .train_multidf2 import eval_products


def build_argparser():
    p = argparse.ArgumentParser("TPU SEAM Match R-CNN MultiDF2 eval")
    p.add_argument("--root_test", type=str, default="data/deepfashion2/validation/image")
    p.add_argument("--test_annots", type=str, default="data/deepfashion2/validation/annots.json")
    p.add_argument("--frames_per_shop_test", type=int, default=10)
    p.add_argument("--first_n_withvideo", type=int, default=100)
    p.add_argument("--score_threshold", type=float, default=0.0)
    p.add_argument("--ckpt_path", type=str, default="ckpt/SEAM/multiDF2/DF2_epoch031")
    p.add_argument("--synthetic", action="store_true",
                   help="generate a synthetic DeepFashion2 fixture and "
                        "evaluate on it — dataset-free end-to-end smoke run")
    p.add_argument("--fp16_gallery", action="store_true",
                   help="score the gallery with the reference's numpy-fp16 "
                        "chain (bit-faithful rank parity; default: f32 on "
                        "device, algebraically identical)")
    p.add_argument("--device_ingest", action="store_true",
                   help="upload raw frames and run resize/canvas placement "
                        "fused on the TPU instead of host cv2 (eval/runner "
                        "ingest='device'; PERF.md lever 6)")
    p.add_argument("--exact_roi_align", action="store_true",
                   help="revert to the exact XLA kernels (RoIAlign AND the "
                        "NLB aggregation) instead of the full Pallas "
                        "serving profile (slower; see PERF.md)")
    return p


def main(argv=None):
    from ..parallel.collectives import initialize_distributed

    initialize_distributed()  # no-op unless SEAM_MULTIHOST=1
    args = build_argparser().parse_args(argv)
    if args.synthetic:
        import tempfile

        from ..data import convert as conv
        from ..data.synthetic import make_synthetic_df2

        root = tempfile.mkdtemp(prefix="seam_synth_mdf2_")
        img_dir, ann_dir = make_synthetic_df2(
            root, n_products=3, views_per_side=2, image_size=(120, 150))
        ann = os.path.join(root, "annots.json")
        conv.convert(img_dir, ann_dir, ann)
        args.root_test, args.test_annots = img_dir, ann
        args.frames_per_shop_test = min(args.frames_per_shop_test, 2)
        args.out_dir = os.path.join(root, "logs_mdf2")
    cfg = ModelConfig() if args.exact_roi_align else serving_model_config()
    model, variables = init_model(cfg, video=True)
    if args.ckpt_path and os.path.exists(args.ckpt_path):
        if os.path.isdir(args.ckpt_path):
            variables = restore_checkpoint(args.ckpt_path)["variables"]
        else:
            variables = load_torch_checkpoint(args.ckpt_path, video=True)
    elif args.ckpt_path and not args.synthetic:
        # fail fast: silently evaluating random-init weights looks like a
        # model regression and wastes the whole eval run
        raise FileNotFoundError(
            f"--ckpt_path {args.ckpt_path!r} does not exist (pass "
            "--ckpt_path '' explicitly to evaluate random-init weights)")

    ds = MultiDeepFashion2Dataset(args.test_annots, args.root_test,
                                  noise=False, filter_onestreet=True)
    return evaluate(
        model, variables,
        eval_products(ds, args.frames_per_shop_test, args.first_n_withvideo),
        EvalConfig(score_threshold=args.score_threshold,
                   frames_per_product=args.frames_per_shop_test,
                   first_n_withvideo=args.first_n_withvideo,
                   ingest="device" if args.device_ingest else "host",
                   gallery_dtype="fp16" if args.fp16_gallery else "f32",
                   tracking_threshold=0.7),
        out_dir=getattr(args, "out_dir", "logs_mdf2"),
    )


if __name__ == "__main__":
    main()
