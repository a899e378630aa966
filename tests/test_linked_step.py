"""Phase1Trainer: exact fused-batch semantics across orientation buckets.

The reference trains mixed-orientation batches in ONE dynamic-shape forward
(/root/reference/stuffs/engine.py:42-64): cls/box/mask loss normalizers span
the batch and the match loss pairs street/shop slots across images.  The
linked trainer must reproduce the fused single-step EXACTLY when a batch is
artificially split into same-canvas buckets.

Config note: sampling here is made rng-INVARIANT by giving every sampler
more slots than candidates (all positives and negatives are taken, losses
are set-sums), so the per-bucket rng keys — which differ from the fused
step's per-position splits by construction — cannot change any loss term.
That isolates exactly what the linked scheme must fix: normalizer scope and
cross-bucket pairs.
"""

import jax
import jax.numpy as jnp
import numpy as np

from seam_match_rcnn_tpu.config import ModelConfig, RPNConfig, RoIHeadsConfig
from seam_match_rcnn_tpu.models.matchrcnn import init_model
from seam_match_rcnn_tpu.train.optim import sgd
from seam_match_rcnn_tpu.train.steps import (Phase1Trainer,
                                             create_train_state,
                                             make_phase1_step)

from test_train_step import make_batch


CANVAS = (32, 32)  # 258 anchors; det_cfg sizes its samplers to take ALL


def det_cfg():
    # sampler capacities == candidate counts => rng-invariant losses (the
    # samplers take EVERY positive and negative, so the per-bucket rng keys
    # cannot change any loss value, only slot order — and every loss is a
    # set-sum): rpn batch == all 258 anchors at the 32x32 canvas; roi batch
    # == 60 proposals + 3 appended gt; positive_fraction .9 keeps every
    # positive; num_mask_slots (128) covers the whole 63-slot sampled set.
    n_anchors = 258  # 3 * (8*8 + 4*4 + 2*2 + 1 + 1), verified vs grid_anchors
    return ModelConfig(
        rpn=RPNConfig(
            pre_nms_top_n_train=60, post_nms_top_n_train=60,
            pre_nms_top_n_test=40, post_nms_top_n_test=60,
            batch_size_per_image=n_anchors, positive_fraction=0.5,
        ),
        roi_heads=RoIHeadsConfig(batch_size_per_image=63,
                                 positive_fraction=0.9,
                                 detections_per_img=10),
        compute_dtype="float32",
    )


def _split_batch(batch, lo, hi):
    def cut(x):
        return x[lo:hi]

    return {
        "images": cut(batch["images"]),
        "sizes": cut(batch["sizes"]),
        "gt": jax.tree.map(cut, batch["gt"]),
    }


def test_linked_two_buckets_match_fused_step():
    cfg = det_cfg()
    model, variables = init_model(cfg, video=False, canvas=CANVAS)
    tx = sgd(lambda s: 0.01, momentum=0.9)
    state = create_train_state(variables, tx)
    batch = make_batch(4, g=3, hw=CANVAS, seed=1)

    fused_step = make_phase1_step(model, tx)
    rng = jax.random.PRNGKey(0)
    fused_state, fused_losses = fused_step(state, batch, rng)

    trainer = Phase1Trainer(model, tx)
    # unbalanced artificial split (3 + 1): per-image weighting would deviate
    buckets = [_split_batch(batch, 0, 3), _split_batch(batch, 3, 4)]
    rngs = list(jax.random.split(jax.random.PRNGKey(7), 2))
    linked_state, linked_losses = trainer.step(state, buckets, rngs)

    for k in ("loss_objectness", "loss_rpn_box_reg", "loss_classifier",
              "loss_box_reg", "loss_mask", "loss_match", "loss"):
        a, b = float(fused_losses[k]), float(linked_losses[k])
        assert abs(a - b) < 1e-4 * (1 + abs(a)), (k, a, b)

    for pa, pb in zip(jax.tree.leaves(fused_state.params),
                      jax.tree.leaves(linked_state.params)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   rtol=1e-4, atol=1e-5)
    # match-predictor BN stats also follow the fused batch
    for sa, sb in zip(jax.tree.leaves(fused_state.batch_stats),
                      jax.tree.leaves(linked_state.batch_stats)):
        np.testing.assert_allclose(np.asarray(sa), np.asarray(sb),
                                   rtol=1e-4, atol=1e-5)
    assert int(linked_state.step) == 1


def test_linked_single_bucket_is_fused_path():
    cfg = det_cfg()
    model, variables = init_model(cfg, video=False, canvas=CANVAS)
    tx = sgd(lambda s: 0.01, momentum=0.9)
    state = create_train_state(variables, tx)
    batch = make_batch(2, g=3, hw=CANVAS, seed=2)
    rng = jax.random.PRNGKey(3)

    fused_state, fused_losses = make_phase1_step(model, tx)(state, batch, rng)
    trainer = Phase1Trainer(model, tx)
    linked_state, linked_losses = trainer.step(state, [batch], [rng])
    assert float(linked_losses["loss"]) == float(fused_losses["loss"])
    for pa, pb in zip(jax.tree.leaves(fused_state.params),
                      jax.tree.leaves(linked_state.params)):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))


def test_engine_mixed_orientation_linked():
    """train_one_epoch_matchrcnn drives Phase1Trainer: a mixed
    portrait+landscape batch performs ONE exact update."""
    import dataclasses

    from seam_match_rcnn_tpu.config import TransformConfig
    from seam_match_rcnn_tpu.train.engine import train_one_epoch_matchrcnn

    rng = np.random.RandomState(0)
    cfg = dataclasses.replace(
        ModelConfig(
            rpn=RPNConfig(pre_nms_top_n_train=80, post_nms_top_n_train=80,
                          pre_nms_top_n_test=40, post_nms_top_n_test=60,
                          batch_size_per_image=32),
            roi_heads=RoIHeadsConfig(batch_size_per_image=64,
                                     detections_per_img=8),
            compute_dtype="float32",
        ),
        transform=TransformConfig(min_size=48, max_size=64))
    model, variables = init_model(
        cfg, video=False, canvas=cfg.transform.landscape_canvas)
    tx = sgd(lambda s: 0.01, momentum=0.9)
    state = create_train_state(variables, tx)
    trainer = Phase1Trainer(model, tx)

    def target(g=2):
        return {
            "boxes": np.asarray([[2, 2, 20, 20], [5, 5, 25, 25]],
                                np.float32)[:g],
            "labels": np.asarray([1, 2], np.int64)[:g],
            "pair_ids": np.asarray([1, 1], np.int64)[:g],
            "styles": np.asarray([1, 1], np.int64)[:g],
            "sources": np.asarray([0, 0], np.int64)[:g],
            "mask_crops": (rng.rand(g, 28, 28) > 0.5).astype(np.uint8),
        }

    images = [rng.rand(40, 60, 3).astype(np.float32),
              rng.rand(60, 40, 3).astype(np.float32)]
    targets = [target(), target()]
    # mark bucket-straddling street/shop partners so the match loss sees a
    # cross-bucket positive pair (the thing the weighted triple drops)
    targets[1]["sources"] = np.asarray([1, 1], np.int64)
    data = [(images, targets, [0, 1])]
    state, _ = train_one_epoch_matchrcnn(
        model, state, trainer, data, epoch=0, rng=jax.random.PRNGKey(0),
        print_freq=10, g_max=4)
    assert int(state.step) == 1
