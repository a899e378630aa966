import numpy as np
import jax
import jax.numpy as jnp

from seam_match_rcnn_tpu.ops.boxes import box_iou
from seam_match_rcnn_tpu.ops.targets import assign_and_sample
from seam_match_rcnn_tpu.train.engine import pad_targets


def test_pad_targets_shapes_and_masking():
    targets = [
        {
            "boxes": np.asarray([[1.0, 2, 3, 4], [5, 6, 7, 8]], np.float32),
            "labels": np.asarray([3, 5]),
            "pair_ids": np.asarray([1, 1]),
            "styles": np.asarray([1, 2]),
            "sources": np.asarray([0, 0]),
            "mask_crops": np.ones((2, 56, 56), np.uint8),
        },
        {
            "boxes": np.zeros((0, 4), np.float32),
            "labels": np.zeros((0,), np.int32),
            "pair_ids": np.zeros((0,), np.int32),
            "styles": np.zeros((0,), np.int32),
            "sources": np.zeros((0,), np.int32),
            "mask_crops": np.zeros((0, 56, 56), np.uint8),
        },
    ]
    out = pad_targets(targets, g_max=4, crop_size=56)
    assert out["boxes"].shape == (2, 4, 4)
    assert out["valid"][0].tolist() == [True, True, False, False]
    assert not out["valid"][1].any()
    assert out["source"].tolist() == [0, 0]


def test_assign_and_sample_oracle():
    rng = np.random.RandomState(0)
    gt = jnp.asarray([[10.0, 10, 50, 50], [100, 100, 160, 170], [0, 0, 0, 0]])
    gt_valid = jnp.asarray([True, True, False])
    gt_labels = jnp.asarray([3, 7, 0])
    # proposals: exact gt copies (pos), near misses, and far boxes (neg)
    props = jnp.asarray([
        [10.0, 10, 50, 50], [12, 12, 52, 52],        # -> gt0
        [100, 100, 160, 170],                        # -> gt1
        [30, 30, 90, 90],                            # partial overlap
        [300, 300, 340, 340], [400, 400, 460, 460],  # bg
    ])
    pvalid = jnp.ones(6, bool)
    matched, labels, sample = assign_and_sample(
        props, pvalid, gt, gt_labels, gt_valid, jax.random.PRNGKey(0),
        batch_size=6, positive_fraction=0.5, fg_iou=0.5, bg_iou=0.5,
    )
    iou = np.array(box_iou(gt, props))
    iou[2] = -1  # padded gt
    want_labels = np.where(iou.max(0) >= 0.5, np.asarray(gt_labels)[iou.argmax(0)], 0)
    np.testing.assert_array_equal(np.asarray(labels), want_labels)
    # positives sampled first
    is_pos = np.asarray(sample.is_pos)
    lab_at = np.asarray(labels)[np.asarray(sample.idx)]
    assert (lab_at[is_pos] > 0).all()
    assert int(is_pos.sum()) == int((want_labels > 0).sum())


def test_assign_and_sample_invalid_proposals_never_sampled():
    gt = jnp.asarray([[0.0, 0, 10, 10]])
    props = jnp.tile(jnp.asarray([[0.0, 0, 10, 10]]), (8, 1))
    pvalid = jnp.asarray([True] * 4 + [False] * 4)
    _, labels, sample = assign_and_sample(
        props, pvalid, gt, jnp.asarray([2]), jnp.asarray([True]),
        jax.random.PRNGKey(1), batch_size=8, positive_fraction=1.0,
        fg_iou=0.5, bg_iou=0.5,
    )
    chosen = np.asarray(sample.idx)[np.asarray(sample.valid)]
    assert (chosen < 4).all()


def test_best_iou_rows_mdf2_reindexes_after_exclusion():
    """A product excluded AFTER some of its street rows were appended (street
    precedes shop in the item stream) must not shift other products' recorded
    row indices — seq_gather/shop_row are remapped to post-filter positions.
    Reference semantics: /root/reference/stuffs/engine.py:263-295."""
    from seam_match_rcnn_tpu.train.engine import _best_iou_rows_mdf2

    def out(scores, boxes):
        scores = np.asarray(scores, np.float32)
        return {
            "scores": scores,
            "boxes": np.asarray(boxes, np.float32),
            "valid": np.ones_like(scores, bool),
        }

    def item(tag, key="0_1", gt=((5, 5, 30, 30),)):
        style, pair = key.split("_")
        return {
            "tag": tag,
            "key": key,
            "styles": np.asarray([int(style)], np.int32),
            "pair_ids": np.asarray([int(pair)], np.int32),
            "boxes": np.asarray(gt, np.float32),
        }

    det = [[4, 4, 31, 31], [50, 50, 70, 70]]
    # order: p0 street (row appended) -> p0 shop (NO detection -> p0
    # excluded) -> p1 shop -> p1 street
    outs = [
        out([0.9, 0.2], det),          # p0 street: best det index 0
        out([0.1, 0.1], det),          # p0 shop: nothing >= thresh
        out([0.2, 0.8], [[50, 50, 70, 70], [6, 6, 29, 29]]),  # p1 shop: det 1
        out([0.7, 0.1], det),          # p1 street: det 0
    ]
    items = [item(0), item(1), item(1), item(0)]
    prods = [0, 0, 1, 1]

    sel = _best_iou_rows_mdf2(outs, items, prods, score_thresh=0.5,
                              n_products=2, frames_per_product=2,
                              max_rows=8)
    assert sel is not None
    # surviving rows (post-filter order): p1 shop, p1 street
    assert sel["shop_row"][0] == -1          # excluded
    assert not sel["seq_mask"][0].any()
    assert sel["shop_row"][1] == 0
    assert sel["seq_mask"][1].tolist() == [True, False]
    r = sel["seq_gather"][1, 0]
    assert sel["row_img"][r] == 3 and sel["row_det"][r] == 0
    assert sel["row_img"][sel["shop_row"][1]] == 2
    assert sel["row_det"][sel["shop_row"][1]] == 1


def test_warmup_schedule_single_step_epoch_uses_full_lr():
    """steps_per_epoch == 1: the reference short-circuits to NO warmup
    (warmup_iters = min(1000, 0) = 0, stuffs/utils.py:442-449) — the one
    step of epoch 0 must train at full lr, not warmup_factor*lr."""
    from seam_match_rcnn_tpu.train.optim import multistep_warmup_schedule

    sched = multistep_warmup_schedule(
        0.02, (6, 9), 0.1, steps_per_epoch=1, warmup_iters=1000,
        warmup_factor=1e-3)
    np.testing.assert_allclose(float(sched(0)), 0.02, rtol=1e-6)
    # and with multiple steps warmup still applies at step 0
    sched2 = multistep_warmup_schedule(
        0.02, (6, 9), 0.1, steps_per_epoch=100, warmup_iters=1000,
        warmup_factor=1e-3)
    assert float(sched2(0)) < 0.001
