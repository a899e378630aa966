import numpy as np
import jax
import jax.numpy as jnp

from seam_match_rcnn_tpu.ops.targets import (
    BELOW_LOW_THRESHOLD,
    BETWEEN_THRESHOLDS,
    balanced_sample,
    match_proposals,
)
from seam_match_rcnn_tpu.ops.boxes import box_iou


def matcher_ref(quality, high, low, allow_low_quality):
    """Naive numpy torchvision Matcher."""
    matched_vals = quality.max(0)
    matches = quality.argmax(0)
    out = matches.copy()
    out[matched_vals < low] = BELOW_LOW_THRESHOLD
    out[(matched_vals >= low) & (matched_vals < high)] = BETWEEN_THRESHOLDS
    if allow_low_quality:
        best_per_gt = quality.max(1, keepdims=True)
        gt_pred_pairs = np.nonzero(quality == best_per_gt)
        out[gt_pred_pairs[1]] = matches[gt_pred_pairs[1]]
    return out


def test_matcher_matches_reference():
    rng = np.random.RandomState(0)
    q = rng.uniform(0, 1, (6, 40)).astype(np.float32)
    for allow in [False, True]:
        got = np.asarray(
            match_proposals(jnp.asarray(q), jnp.ones(6, bool), 0.7, 0.3, allow)
        )
        want = matcher_ref(q, 0.7, 0.3, allow)
        np.testing.assert_array_equal(got, want)


def test_matcher_ignores_padded_gt():
    rng = np.random.RandomState(1)
    q = rng.uniform(0.8, 1, (4, 10)).astype(np.float32)
    gt_valid = jnp.asarray([True, True, False, False])
    got = np.asarray(match_proposals(jnp.asarray(q), gt_valid, 0.5, 0.5))
    assert (got < 2).all()  # padded gts never matched


def test_balanced_sample_counts():
    labels = jnp.asarray([1] * 30 + [0] * 400 + [-1] * 20)
    res = balanced_sample(labels, jax.random.PRNGKey(0), 128, 0.25)
    lab = np.asarray(labels)[np.asarray(res.idx)]
    assert res.valid.all()
    assert (lab[np.asarray(res.is_pos)] >= 1).all()
    assert int(np.asarray(res.is_pos).sum()) == 30  # min(30, 32)
    assert int(np.asarray(res.valid).sum()) == 128


def test_balanced_sample_pos_cap():
    labels = jnp.asarray([1] * 300 + [0] * 100)
    res = balanced_sample(labels, jax.random.PRNGKey(1), 128, 0.25)
    assert int(np.asarray(res.is_pos).sum()) == 32
    assert int(np.asarray(res.valid).sum()) == 128


def test_balanced_sample_scarce_negatives():
    labels = jnp.asarray([1] * 4 + [0] * 2 + [-1] * 50)
    res = balanced_sample(labels, jax.random.PRNGKey(2), 16, 0.5)
    assert int(np.asarray(res.valid).sum()) == 6
    lab = np.asarray(labels)[np.asarray(res.idx)]
    assert (lab[np.asarray(res.valid)] >= 0).all()


def test_iou_quality_pipeline():
    gts = jnp.asarray([[0, 0, 10, 10], [20, 20, 40, 40]], dtype=jnp.float32)
    props = jnp.asarray(
        [[0, 0, 10, 10], [21, 21, 40, 40], [100, 100, 110, 110]], dtype=jnp.float32
    )
    q = box_iou(gts, props)
    m = np.asarray(match_proposals(q, jnp.ones(2, bool), 0.5, 0.5))
    assert m[0] == 0 and m[1] == 1 and m[2] == BELOW_LOW_THRESHOLD


def test_matcher_zero_overlap_gt_stays_background():
    """Documented deviation from torchvision: a gt with ZERO IoU against
    every anchor does NOT promote all those zero-IoU anchors to positives
    (torchvision's unguarded set_low_quality_matches_ would — degenerate
    reference behavior, not copied; see ops/targets.py)."""
    q = np.zeros((2, 10), np.float32)
    q[0, 3] = 0.8          # gt 0 overlaps anchor 3; gt 1 overlaps nothing
    out = np.asarray(match_proposals(
        jnp.asarray(q), jnp.asarray([True, True]),
        high_threshold=0.7, low_threshold=0.3, allow_low_quality=True))
    assert out[3] == 0
    # every other anchor is background, NOT a low-quality match of gt 1
    assert (out[np.arange(10) != 3] == BELOW_LOW_THRESHOLD).all()
