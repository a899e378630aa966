"""Phase-1 end-to-end smoke: synthetic DF2 fixture -> pair sampler ->
canvas-bucketed engine -> jitted supervised step."""

import numpy as np
import jax
import pytest

from seam_match_rcnn_tpu.config import ModelConfig, RPNConfig, RoIHeadsConfig, TransformConfig
from seam_match_rcnn_tpu.data import convert as conv
from seam_match_rcnn_tpu.data.df2 import DF2PairBatchSampler, DeepFashion2Dataset
from seam_match_rcnn_tpu.data.transforms import Compose, RandomHorizontalFlip, ToArray
from seam_match_rcnn_tpu.data.synthetic import make_synthetic_df2
from seam_match_rcnn_tpu.models.matchrcnn import init_model
from seam_match_rcnn_tpu.train.engine import train_one_epoch_matchrcnn
from seam_match_rcnn_tpu.train.optim import multistep_warmup_schedule, sgd
from seam_match_rcnn_tpu.train.steps import create_train_state, make_phase1_step


def test_phase1_epoch_on_synthetic_df2(tmp_path):
    img_dir, ann_dir = make_synthetic_df2(str(tmp_path), n_products=2,
                                          views_per_side=2, image_size=(120, 150))
    ann = str(tmp_path / "annots.json")
    conv.convert(img_dir, ann_dir, ann)
    ds = DeepFashion2Dataset(ann, img_dir,
                             transforms=Compose([ToArray(), RandomHorizontalFlip(0.5)]))
    sampler = DF2PairBatchSampler(ds, batch_size=2, seed=0)

    cfg = ModelConfig(
        rpn=RPNConfig(
            pre_nms_top_n_train=80, post_nms_top_n_train=100,
            pre_nms_top_n_test=40, post_nms_top_n_test=60,
            batch_size_per_image=32,
        ),
        roi_heads=RoIHeadsConfig(batch_size_per_image=64, detections_per_img=8),
        transform=TransformConfig(min_size=96, max_size=128),
        compute_dtype="float32",
    )
    model, variables = init_model(cfg, video=False, canvas=(96, 128))
    sched = multistep_warmup_schedule(0.005, (6,), 0.1, 10, 5, 1e-3)
    tx = sgd(sched, momentum=0.9)
    state = create_train_state(variables, tx)
    step = make_phase1_step(model, tx)

    def batches():
        count = 0
        for idxs in sampler:
            if count >= 2:
                break
            count += 1
            items = [ds[i] for i in idxs]
            yield [i[0] for i in items], [i[1] for i in items], [i[2] for i in items]

    state, _ = train_one_epoch_matchrcnn(
        model, state, step, batches(), epoch=0, rng=jax.random.PRNGKey(0),
        print_freq=1, g_max=4,
    )
    assert int(state.step) >= 2
