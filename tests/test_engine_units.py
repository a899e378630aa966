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
