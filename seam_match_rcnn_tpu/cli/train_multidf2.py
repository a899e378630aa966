"""Phase-2 CLI: SEAM training on MultiDeepFashion2.

Mirrors /root/reference/train_multiDF2.py (defaults at :152-186): same
recipe as MovingFashion training with n_shops=8 and the
aggregator-only MultiDF2 loss (stuffs/engine.py:202-340).
"""

from __future__ import annotations

import argparse
import jax
import os

from ..config import (EvalConfig, ModelConfig, SEAMTrainConfig,
                      serving_model_config)
from ..ckpt.io import (CheckpointManager, resolve_auto_resume,
                       restore_training_checkpoint)
from ..ckpt.torch_convert import load_pretrained_detector
from ..data.multidf2 import MultiDeepFashion2Dataset, product_batches
from ..eval.multidf2 import evaluate
from ..eval.runner import InferenceRunner
from ..models.matchrcnn import init_model
from ..train.engine import train_one_epoch_multidf2
from ..train.optim import multistep_warmup_schedule, sgd
from ..train.seam import create_head_state, make_mdf2_head_step, merge_head_state
from ..utils.logging import ScalarWriter
from ._args import strtobool


def build_argparser():
    p = argparse.ArgumentParser("TPU SEAM Match R-CNN MultiDF2 training")
    p.add_argument("--root_train", type=str, default="data/deepfashion2/train/image")
    p.add_argument("--train_annots", type=str, default="data/deepfashion2/train/annots.json")
    p.add_argument("--root_test", type=str, default="data/deepfashion2/validation/image")
    p.add_argument("--test_annots", type=str, default="data/deepfashion2/validation/annots.json")
    p.add_argument("--n_shops", type=int, default=8)
    p.add_argument("--frames_per_shop_train", type=int, default=10)
    p.add_argument("--frames_per_shop_test", type=int, default=10)
    p.add_argument("--epochs", type=int, default=31)
    # reference MultiDF2 lr default is 0.02 (train_multiDF2.py:170), not
    # the MovingFashion 0.04
    p.add_argument("--lr", type=float, default=0.02)
    p.add_argument("--w_decay", type=float, default=5e-4)
    p.add_argument("--milestones", type=int, nargs="+", default=[15, 25])
    p.add_argument("--gamma", type=float, default=0.1)
    # reference passes 0.1 into the epoch loop (train_multiDF2.py:113)
    p.add_argument("--score_thresh", type=float, default=0.1)
    p.add_argument("--eval_freq", type=int, default=4)
    p.add_argument("--save_epochs", type=int, default=2)
    p.add_argument("--save_steps", type=int, default=0,
                   help="also checkpoint every N product batches into an "
                        "overwriting 'mid' slot (0 = off); --start_ckpt on "
                        "a mid checkpoint resumes inside the epoch "
                        "(preemption-safe training, beyond-reference)")
    p.add_argument("--save_tag", type=str, default="seam_mdf2")
    p.add_argument("--save_dir", type=str, default="ckpt")
    p.add_argument("--log_dir", type=str, default="runs")
    p.add_argument("--print_freq", type=int, default=20)
    p.add_argument("--first_n_withvideo", type=int, default=100)
    p.add_argument("--noise", type=strtobool, default=True)
    p.add_argument("--pretrained_path", type=str, default="ckpt/df2matchrcnn")
    p.add_argument("--start_ckpt", type=str, default=None)
    p.add_argument("--auto_resume", action="store_true",
                   help="resume from the newest checkpoint under "
                        "save_dir/save_tag (mid-epoch slot included) when "
                        "--start_ckpt is not given; no-op on a fresh run")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--synthetic", action="store_true",
                   help="train one epoch on a generated synthetic "
                        "MultiDF2 fixture (products with >= 3 street "
                        "views) — dataset-free end-to-end smoke of the "
                        "aggregator-only MultiDF2 loop")
    p.add_argument("--device_ingest", action="store_true",
                   help="raw-frame upload + TPU-fused resize for the frozen-"
                        "detector inference pass (eval/runner ingest='device')")
    p.add_argument("--exact_roi_align", action="store_true",
                   help="revert the frozen-detector inference pass to the exact "
                        "XLA kernels (RoIAlign AND the NLB aggregation) — "
                        "phase-2 gradients never flow through them, so the "
                        "Pallas serving profile is the default; see PERF.md)")
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
        # >= 3 street views per product: the MultiDF2 aggregation loss
        # needs >= 3 winners per sequence (match_head.py:406)
        img_dir, ann_dir = make_synthetic_df2(
            root, n_products=3, views_per_side=4, image_size=(160, 200))
        ann = os.path.join(root, "annots.json")
        conv.convert(img_dir, ann_dir, ann)
        args.root_train = args.root_test = img_dir
        args.train_annots = args.test_annots = ann
        args.n_shops, args.frames_per_shop_train = 2, 3
        args.frames_per_shop_test = 3
        args.epochs, args.eval_freq, args.print_freq = 1, 1, 1
        args.save_dir = os.path.join(root, "ckpt")
        args.pretrained_path = ""
    cfg = ModelConfig() if args.exact_roi_align else serving_model_config()
    tcfg = SEAMTrainConfig(
        lr=args.lr, weight_decay=args.w_decay, milestones=tuple(args.milestones),
        gamma=args.gamma, epochs=args.epochs, n_shops=args.n_shops,
        frames_per_shop=args.frames_per_shop_train, score_thresh=args.score_thresh,
        eval_freq=args.eval_freq, save_epochs=args.save_epochs,
        save_steps=args.save_steps,
        print_freq=args.print_freq, seed=args.seed,
    )

    train_ds = MultiDeepFashion2Dataset(args.train_annots, args.root_train,
                                        noise=args.noise)
    test_ds = MultiDeepFashion2Dataset(args.test_annots, args.root_test,
                                       noise=False, filter_onestreet=True)

    model, variables = init_model(cfg, video=True)
    if args.pretrained_path and os.path.exists(args.pretrained_path):
        variables = load_pretrained_detector(
            args.pretrained_path, variables, clone_match_to_aggregator=True
        )

    # per-PROCESS steps: the sampler shards batches over processes, so the
    # schedule must count only this process's optimizer steps or multistep
    # milestones fire process_count x too late under SEAM_MULTIHOST=1
    steps_per_epoch = max(
        len(train_ds) // (tcfg.n_shops * jax.process_count()), 1)
    schedule = multistep_warmup_schedule(
        tcfg.lr, tcfg.milestones, tcfg.gamma, steps_per_epoch,
        tcfg.warmup_iters, tcfg.warmup_factor,
    )
    tx = sgd(schedule, tcfg.momentum, tcfg.weight_decay)
    head_state = create_head_state(variables, tx)
    start_ep = 0
    resume_skip = 0  # batches already done in start_ep (mid-epoch resume)
    if args.auto_resume and not args.start_ckpt:
        args.start_ckpt = resolve_auto_resume(args.save_dir, args.save_tag)
        if args.start_ckpt:
            print(f"auto-resume from {args.start_ckpt}")
    if args.start_ckpt:
        # reference resume restores model + optimizer + scheduler epoch
        # (train_movingfashion.py:79-83); target= keeps optax's typed
        # opt_state through orbax; mid-epoch checkpoints (save_steps) also
        # carry step_in_epoch
        payload, is_mid = restore_training_checkpoint(
            args.start_ckpt,
            {"variables": variables,
             "head_state": head_state._asdict(), "epoch": 0},
        )
        variables = payload["variables"]
        from ..train.seam import HeadState

        head_state = HeadState(**payload["head_state"])
        if is_mid:
            start_ep = int(payload["epoch"])
            resume_skip = int(payload["step_in_epoch"]) + 1
            print(f"mid-epoch resume: epoch {start_ep}, "
                  f"skipping {resume_skip} batches")
        else:
            start_ep = int(payload.get("epoch", 0)) + 1

    head_step = make_mdf2_head_step(tx, n_frames=cfg.match.n_frames)
    writer = ScalarWriter(os.path.join(args.log_dir, args.save_tag))
    ckpts = CheckpointManager(os.path.join(args.save_dir, args.save_tag),
                              tcfg.save_epochs)

    for epoch in range(start_ep, tcfg.epochs):
        runner = InferenceRunner(
            model, merge_head_state(variables, head_state),
            chunk=tcfg.infer_chunk, with_match=False, with_aggr_features=False,
            with_roi_features=True,
            ingest="device" if args.device_ingest else "host",
        )
        from ..data.prefetch import prefetch

        skip = resume_skip if epoch == start_ep else 0

        def save_mid(hs, step_in_epoch, epoch=epoch):
            ckpts.save_mid({"variables": merge_head_state(variables, hs),
                            "head_state": hs._asdict(), "epoch": epoch,
                            "step_in_epoch": step_in_epoch})

        head_state = train_one_epoch_multidf2(
            model, variables, head_state, head_step, runner,
            prefetch(product_batches(train_ds, tcfg.n_shops, tcfg.frames_per_shop,
                                     seed=tcfg.seed, epoch=epoch, drop_last=True,
                                     num_shards=jax.process_count(),
                                     shard=jax.process_index(),
                                     skip_batches=skip)),
            epoch, tcfg.n_shops, tcfg.frames_per_shop,
            score_thresh=tcfg.score_thresh, print_freq=tcfg.print_freq,
            writer=writer, start_step=skip,
            save_every_steps=tcfg.save_steps,
            save_fn=save_mid if tcfg.save_steps else None,
        )
        merged = merge_head_state(variables, head_state)
        ckpts.maybe_save(epoch, {"variables": merged,
                                 "head_state": head_state._asdict(),
                                 "epoch": epoch})
        if tcfg.eval_freq > 0 and epoch % tcfg.eval_freq == 0:
            res = evaluate(
                model, merged,
                eval_products(test_ds, args.frames_per_shop_test,
                              args.first_n_withvideo),
                EvalConfig(frames_per_product=args.frames_per_shop_test,
                           first_n_withvideo=args.first_n_withvideo,
                           tracking_threshold=0.7),
            )
            for tag, v in zip(("acc_single", "acc_avgdesc", "acc_aggrdesc"), res):
                writer.add_scalar(tag, v, global_step=epoch)
            print(f"epoch {epoch}: single/avg/aggr = {res}")
    ckpts.maybe_save(tcfg.epochs - 1,
                     {"variables": merge_head_state(variables, head_state),
                      "head_state": head_state._asdict(),
                      "epoch": tcfg.epochs - 1}, final=True)
    writer.close()


def eval_products(ds: MultiDeepFashion2Dataset, frames: int, first_n):
    for k, items in enumerate(product_batches(ds, 1, frames, shuffle=False)):
        yield {
            "images": [it["image"] for it in items],
            "targets": items,
            "key": items[0]["key"],
            "has_video": k < first_n if first_n is not None else True,
        }


if __name__ == "__main__":
    main()
