"""Phase-1 CLI: supervised Match R-CNN training on DeepFashion2.

Mirrors /root/reference/train_matchrcnn.py (argparse surface at :110-133):
SGD lr 0.02 momentum 0.9, MultiStepLR [6, 9], 12 epochs, checkpoints every
2 epochs, num_classes 14.  Distributed setup is a jax Mesh instead of
torch.distributed.launch; pass --n_devices to bound the data axis.

The reference's broken ``models.maskrcnn`` import (train_matchrcnn.py:61) is
a latent bug, not behavior — nothing to replicate.
"""

from __future__ import annotations

import argparse
import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig, TrainConfig, serving_model_config
from ..data.df2 import DF2PairBatchSampler, DeepFashion2Dataset
from ..data.prefetch import prefetch
from ..data.transforms import Compose, RandomHorizontalFlip, ToArray
from ..ckpt.io import (CheckpointManager, resolve_auto_resume,
                       restore_training_checkpoint)
from ..models.matchrcnn import init_model
from ..train.engine import train_one_epoch_matchrcnn
from ..train.optim import backbone_frozen_mask, multistep_warmup_schedule, sgd
from ..train.steps import Phase1Trainer, TrainState, create_train_state
from ..utils.logging import ScalarWriter


def build_argparser():
    p = argparse.ArgumentParser("TPU Match R-CNN phase-1 training")
    p.add_argument("--root_train", type=str, default="data/deepfashion2/train/image")
    p.add_argument("--train_annots", type=str, default="data/deepfashion2/train/annots.json")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--epochs", type=int, default=12)
    p.add_argument("--lr", type=float, default=0.02)
    p.add_argument("--momentum", type=float, default=0.9)
    p.add_argument("--clip_grad_norm", type=float, default=0.0,
                   help="global-norm gradient clipping (0 = off, reference "
                        "parity); use ~5.0 when training from scratch "
                        "without --imagenet_backbone")
    p.add_argument("--milestones", type=int, nargs="+", default=[6, 9])
    p.add_argument("--gamma", type=float, default=0.1)
    p.add_argument("--save_epochs", type=int, default=2)
    p.add_argument("--save_steps", type=int, default=0,
                   help="also checkpoint every N optimizer steps into an "
                        "overwriting 'mid' slot (0 = off); --start_ckpt on "
                        "a mid checkpoint resumes inside the epoch "
                        "(preemption-safe training, beyond-reference)")
    p.add_argument("--save_tag", type=str, default="matchrcnn")
    p.add_argument("--save_dir", type=str, default="ckpt")
    p.add_argument("--log_dir", type=str, default="runs")
    p.add_argument("--print_freq", type=int, default=100)
    p.add_argument("--start_ckpt", type=str, default=None)
    p.add_argument("--auto_resume", action="store_true",
                   help="resume from the newest checkpoint under "
                        "save_dir/save_tag (mid-epoch slot included) when "
                        "--start_ckpt is not given; no-op on a fresh run")
    # ImageNet resnet50 state_dict (torch file) — the reference's
    # pretrained_backbone=True warm-start
    p.add_argument("--imagenet_backbone", type=str, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--synthetic", action="store_true",
                   help="train one epoch on a generated synthetic "
                        "DeepFashion2 fixture at reduced geometry — "
                        "dataset-free end-to-end smoke run of the phase-1 "
                        "pipeline (sampler, engine, jitted step, ckpt)")
    p.add_argument("--train_full_backbone", action="store_true",
                   help="also train the backbone stem (conv1+bn1) and layer1 "
                        "— the reference's torchvision backbone freezes them "
                        "(trainable_layers=3 default) so parity keeps them "
                        "frozen; enable only for from-scratch experiments "
                        "(beyond-reference)")
    p.add_argument("--exact_roi_align", action="store_true",
                   help="use the exact XLA RoIAlign forward instead of the "
                        "Pallas kernel (the Pallas path is differentiable: "
                        "exact adjoint backward, 1.36x step speedup; its "
                        "forward approximates only extreme-aspect outlier "
                        "boxes — see PERF.md)")
    p.add_argument("--roi_backend", type=str, default="pallas_resident",
                   choices=["pallas", "pallas_resident", "xla"],
                   help="training RoIAlign backend; both Pallas kernels "
                        "carry a custom_vjp exact-adjoint backward.  "
                        "pallas_resident (default): tile-resident, ~9x "
                        "fewer forward HBM bytes — measured fastest on the "
                        "phase-1 step A/B (13.25 vs 13.13 pallas vs 9.65 "
                        "xla images/sec/chip, PERF.md round 4)")
    p.add_argument("--prefetch_depth", type=int, default=2,
                   help="decode-ahead depth of the threaded batch "
                        "prefetcher (data/prefetch.py) — overlaps jpeg "
                        "decode + mask-crop rasterization with the device "
                        "step, replacing the reference's DataLoader "
                        "workers (/root/reference/datasets/"
                        "DF2Dataset.py:194-204); 0 disables (decode "
                        "serialized with the step, for A/Bs)")
    return p


def main(argv=None):
    from ..parallel.collectives import initialize_distributed

    initialize_distributed()  # no-op unless SEAM_MULTIHOST=1
    args = build_argparser().parse_args(argv)
    # Phase-1 trains THROUGH RoIAlign: both Pallas backends carry a
    # custom_vjp exact-adjoint backward; --roi_backend selects.  Default
    # pallas_resident: fastest in the on-chip train-step A/B (PERF.md
    # round 4) AND ~9x fewer forward HBM bytes (the lever on real v5e).
    from ..config import RoIHeadsConfig

    backend = "xla" if args.exact_roi_align else args.roi_backend
    cfg = (ModelConfig() if args.exact_roi_align else serving_model_config(
        roi_heads=RoIHeadsConfig(roi_align_backend=backend)))
    if not args.train_full_backbone:
        # stem+layer1 are frozen (mask below) — also cut their gradient
        # flow so every step variant skips the dead stem/layer1 backward
        # (config.ModelConfig.freeze_backbone_stages; exact)
        cfg = dataclasses.replace(cfg, freeze_backbone_stages=True)
    else:
        # the fused Pallas stem has no vjp: an unfrozen stem must train
        # through the XLA ops (loud trace error otherwise)
        cfg = dataclasses.replace(cfg, stem_backend="xla")
    if args.synthetic:
        import tempfile

        from ..config import RPNConfig, TransformConfig
        from ..data import convert as conv
        from ..data.synthetic import make_synthetic_df2

        root = tempfile.mkdtemp(prefix="seam_synth_df2_")
        img_dir, ann_dir = make_synthetic_df2(
            root, n_products=2, views_per_side=2, image_size=(120, 150))
        ann = os.path.join(root, "annots.json")
        conv.convert(img_dir, ann_dir, ann)
        args.root_train, args.train_annots = img_dir, ann
        args.batch_size, args.print_freq = 2, 1
        if args.epochs == 12:  # argparse default -> smoke-scale single epoch
            args.epochs = 1
        # The tiny epoch finishes warmup almost immediately (warmup clamps
        # to steps_per_epoch-1, as in the reference), so the full 0.02 from-
        # scratch lr diverges at batch 2 — use a smoke-scale lr, f32
        # compute.  Only when --lr wasn't explicitly passed.
        if args.lr == 0.02:
            args.lr = 0.002
        if args.save_dir == "ckpt":  # keep an explicitly-passed save_dir
            args.save_dir = os.path.join(root, "ckpt")
        print(f"synthetic mode: save_dir={args.save_dir}")
        cfg = dataclasses.replace(
            cfg,
            compute_dtype="float32",
            rpn=RPNConfig(pre_nms_top_n_train=80, post_nms_top_n_train=100,
                          pre_nms_top_n_test=40, post_nms_top_n_test=60,
                          batch_size_per_image=32),
            roi_heads=dataclasses.replace(
                cfg.roi_heads, batch_size_per_image=64, detections_per_img=8),
            transform=TransformConfig(min_size=96, max_size=128),
        )
    tcfg = TrainConfig(
        lr=args.lr, momentum=args.momentum, milestones=tuple(args.milestones),
        gamma=args.gamma, epochs=args.epochs, batch_size=args.batch_size,
        save_epochs=args.save_epochs, save_steps=args.save_steps,
        print_freq=args.print_freq, seed=args.seed,
        clip_grad_norm=args.clip_grad_norm,
    )

    dataset = DeepFashion2Dataset(
        args.train_annots, args.root_train,
        transforms=Compose([ToArray(), RandomHorizontalFlip(0.5)]),
    )
    sampler = DF2PairBatchSampler(
        dataset, tcfg.batch_size, seed=tcfg.seed,
        num_shards=jax.process_count(), shard=jax.process_index(),
    )
    steps_per_epoch = max(len(sampler), 1)

    model, variables = init_model(cfg, video=False)
    if args.imagenet_backbone and os.path.exists(args.imagenet_backbone):
        import torch

        from ..ckpt.torch_convert import import_imagenet_backbone

        variables = import_imagenet_backbone(
            variables,
            torch.load(args.imagenet_backbone, map_location="cpu",
                       weights_only=False),
        )
    schedule = multistep_warmup_schedule(
        tcfg.lr, tcfg.milestones, tcfg.gamma, steps_per_epoch,
        tcfg.warmup_iters, tcfg.warmup_factor,
    )
    # Parity: freeze stem+layer1 and all FrozenBN affines, exactly the params
    # the reference optimizer never sees (requires_grad filter over the
    # torchvision trainable_layers=3 backbone, train_matchrcnn.py:70)
    mask = None if args.train_full_backbone else backbone_frozen_mask
    tx = sgd(schedule, tcfg.momentum, tcfg.weight_decay,
             clip_grad_norm=tcfg.clip_grad_norm, trainable_mask=mask)
    state = create_train_state(variables, tx)
    rng = jax.random.PRNGKey(tcfg.seed)
    start_ep = 0
    resume_skip = 0  # batches already done in start_ep (mid-epoch resume)
    if args.auto_resume and not args.start_ckpt:
        args.start_ckpt = resolve_auto_resume(args.save_dir, args.save_tag)
        if args.start_ckpt:
            print(f"auto-resume from {args.start_ckpt}")
    if args.start_ckpt:
        # restore_training_checkpoint reimposes the live state's tree types
        # (optax opt_state is a NamedTuple chain; a raw-dict restore would
        # break tx.update) and detects mid-epoch checkpoints
        payload, is_mid = restore_training_checkpoint(
            args.start_ckpt, {"state": state._asdict(), "epoch": 0})
        state = TrainState(**payload["state"])
        if is_mid:
            start_ep = int(payload["epoch"])
            resume_skip = int(payload["step_in_epoch"]) + 1
            rng = jnp.asarray(payload["rng"])
            print(f"mid-epoch resume: epoch {start_ep}, "
                  f"skipping {resume_skip} batches")
        else:
            start_ep = int(payload.get("epoch", 0)) + 1

    # Phase1Trainer: one optimizer update per batch with exact fused-batch
    # semantics even when orientations mix — batch-spanning normalizers and
    # cross-bucket street-shop match pairs (reference engine.py:42-64)
    step_fn = Phase1Trainer(model, tx)
    writer = ScalarWriter(os.path.join(args.log_dir, args.save_tag))
    ckpts = CheckpointManager(os.path.join(args.save_dir, args.save_tag),
                              tcfg.save_epochs)

    def batches(epoch, skip=0):
        # skip: batches already trained before a mid-epoch resume — the
        # sampler is epoch-seeded, so index batches (and their in-batch
        # partner draws) replay identically; skipping happens BEFORE image
        # load, so the fast-forward costs only index math
        sampler.set_epoch(epoch)
        for bi, idxs in enumerate(sampler):
            if bi < skip:
                continue
            items = [dataset[i] for i in idxs]
            yield [i[0] for i in items], [i[1] for i in items], [i[2] for i in items]

    for epoch in range(start_ep, tcfg.epochs):
        skip = resume_skip if epoch == start_ep else 0

        def save_mid(state, rng, step_in_epoch, epoch=epoch):
            ckpts.save_mid({"state": state._asdict(), "epoch": epoch,
                            "step_in_epoch": step_in_epoch,
                            "rng": np.asarray(rng)})

        # decode-ahead: jpeg load + mask-crop rasterization for batch i+1
        # overlaps the device step on batch i (depth 0 = raw generator)
        data = batches(epoch, skip)
        if args.prefetch_depth > 0:
            data = prefetch(data, depth=args.prefetch_depth)
        try:
            state, rng = train_one_epoch_matchrcnn(
                model, state, step_fn, data, epoch, rng,
                print_freq=tcfg.print_freq, writer=writer,
                steps_per_epoch=steps_per_epoch, start_step=skip,
                save_every_steps=tcfg.save_steps,
                save_fn=save_mid if tcfg.save_steps else None,
            )
        finally:
            if args.prefetch_depth > 0:
                data.close()
        ckpts.maybe_save(epoch, {"state": state._asdict(), "epoch": epoch})
    ckpts.maybe_save(tcfg.epochs - 1, {"state": state._asdict(), "epoch": tcfg.epochs - 1},
                     final=True)
    writer.close()


if __name__ == "__main__":
    main()
