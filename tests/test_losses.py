import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from seam_match_rcnn_tpu.losses import detection as D
from seam_match_rcnn_tpu.losses import match as M


def test_fastrcnn_loss_matches_torch():
    rng = np.random.RandomState(0)
    n, c = 24, 5
    logits = rng.randn(n, c).astype(np.float32)
    deltas = rng.randn(n, c * 4).astype(np.float32)
    labels = rng.randint(0, c, n)
    targets = rng.randn(n, 4).astype(np.float32)
    valid = np.ones(n, bool)

    lc, lb = D.fastrcnn_loss(
        jnp.asarray(logits), jnp.asarray(deltas), jnp.asarray(labels),
        jnp.asarray(targets), jnp.asarray(valid),
    )
    t_lc = torch.nn.functional.cross_entropy(
        torch.from_numpy(logits), torch.from_numpy(labels)
    ).item()
    pos = labels > 0
    picked = deltas.reshape(n, c, 4)[np.arange(n), labels][pos]
    t_lb = (
        torch.nn.functional.smooth_l1_loss(
            torch.from_numpy(picked), torch.from_numpy(targets[pos]),
            beta=1.0 / 9, reduction="sum",
        )
        / n
    ).item()
    assert float(lc) == pytest.approx(t_lc, rel=1e-5)
    assert float(lb) == pytest.approx(t_lb, rel=1e-5)


def test_fastrcnn_loss_padding_invariance():
    rng = np.random.RandomState(1)
    n, c = 10, 4
    logits = rng.randn(n, c).astype(np.float32)
    deltas = rng.randn(n, c * 4).astype(np.float32)
    labels = rng.randint(0, c, n)
    targets = rng.randn(n, 4).astype(np.float32)
    valid = np.ones(n, bool)
    base = D.fastrcnn_loss(*map(jnp.asarray, (logits, deltas, labels, targets, valid)))
    # pad with garbage rows
    pad = 6
    logits_p = np.concatenate([logits, rng.randn(pad, c).astype(np.float32) * 50])
    deltas_p = np.concatenate([deltas, rng.randn(pad, c * 4).astype(np.float32) * 50])
    labels_p = np.concatenate([labels, rng.randint(0, c, pad)])
    targets_p = np.concatenate([targets, rng.randn(pad, 4).astype(np.float32) * 50])
    valid_p = np.concatenate([valid, np.zeros(pad, bool)])
    padded = D.fastrcnn_loss(*map(jnp.asarray, (logits_p, deltas_p, labels_p, targets_p, valid_p)))
    assert float(base[0]) == pytest.approx(float(padded[0]), rel=1e-6)
    assert float(base[1]) == pytest.approx(float(padded[1]), rel=1e-6)


def test_maskrcnn_loss_matches_torch_bce():
    rng = np.random.RandomState(2)
    p, c = 6, 5
    logits = rng.randn(p, 28, 28, c).astype(np.float32)
    targets = (rng.rand(p, 28, 28) > 0.5).astype(np.float32)
    labels = rng.randint(1, c, p)
    got = float(D.maskrcnn_loss(
        jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(labels),
        jnp.ones(p, bool),
    ))
    per_label = logits[np.arange(p), :, :, :][..., 0] * 0  # placeholder
    sel = np.stack([logits[i, :, :, labels[i]] for i in range(p)])
    want = torch.nn.functional.binary_cross_entropy_with_logits(
        torch.from_numpy(sel), torch.from_numpy(targets)
    ).item()
    assert got == pytest.approx(want, rel=1e-5)


def test_mask_targets_identity_proposal():
    # proposal == gt box -> target is the crop resampled to 28x28
    crop = np.zeros((1, 56, 56), np.float32)
    crop[0, :28, :] = 1.0  # top half on
    gt_boxes = jnp.asarray([[10.0, 20.0, 66.0, 76.0]])
    proposals = jnp.asarray([[10.0, 20.0, 66.0, 76.0]])
    out = np.asarray(D.mask_targets_from_crops(
        jnp.asarray(crop), gt_boxes, proposals, jnp.asarray([0]), out_size=28
    ))
    assert out.shape == (1, 28, 28)
    assert out[0, :13].mean() > 0.95
    assert out[0, 15:].mean() < 0.05


def test_masked_pair_ce_matches_torch_weighted():
    rng = np.random.RandomState(3)
    n, m = 5, 7
    logits = rng.randn(n, m, 2).astype(np.float32)
    gts = rng.randint(0, 2, (n, m))
    got = float(M.masked_pair_ce(
        jnp.asarray(logits), jnp.asarray(gts), jnp.ones((n, m), bool), (1.0, 0.3)
    ))
    crit = torch.nn.CrossEntropyLoss(weight=torch.tensor([1.0, 0.3]))
    want = crit(
        torch.from_numpy(logits.reshape(-1, 2)), torch.from_numpy(gts.reshape(-1))
    ).item()
    assert got == pytest.approx(want, rel=1e-5)


def test_match_loss_supervised_damping_and_styles():
    # identical descriptors => logits constant; just check gating by style
    logits = jnp.zeros((3, 3, 2))
    pairs_s = jnp.asarray([1, 2, 3])
    pairs_p = jnp.asarray([1, 2, 9])
    styles_s = jnp.asarray([1, 0, 2])
    styles_p = jnp.asarray([1, 0, 2])
    v = jnp.ones(3, bool)
    l_strict = M.match_loss_supervised(logits, pairs_s, styles_s, pairs_p, styles_p, v, v, True)
    l_loose = M.match_loss_supervised(logits, pairs_s, styles_s, pairs_p, styles_p, v, v, False)
    # with style!=0 required, pair (2,2,style0) is negative -> fewer positives
    assert np.isfinite(float(l_strict)) and np.isfinite(float(l_loose))
    # CE of uniform logits is log(2) < 1 -> no damping branch taken
    assert float(l_strict) == pytest.approx(np.log(2), rel=1e-5)


def weak_labels_ref(logits, street_img, street_col, valid, threshold):
    n, m = logits.shape[:2]
    gts = np.zeros((n, m), np.int64)
    for img in np.unique(street_img):
        rows = [i for i in range(n) if street_img[i] == img and valid[i] and street_col[i] >= 0]
        if not rows:
            continue
        col = street_col[rows[0]]
        scores = [logits[i, col, 1] for i in rows]
        best = int(np.argmax(scores))
        if scores[best] > threshold:
            gts[rows[best], col] = 1
    return gts


def test_weak_match_labels_match_reference():
    rng = np.random.RandomState(4)
    n, m = 12, 4
    logits = rng.randn(n, m, 2).astype(np.float32)
    street_img = rng.randint(0, 5, n)
    cols = rng.randint(0, m, 5)
    street_col = cols[street_img].astype(np.int32)
    street_col[street_img == 3] = -1  # product without shop
    valid = rng.rand(n) > 0.2
    got = np.asarray(M.weak_match_labels(
        jnp.asarray(logits), jnp.asarray(street_img), jnp.asarray(street_col),
        jnp.asarray(valid), num_images=5, match_threshold=-10.0,
    ))
    want = weak_labels_ref(logits, street_img, street_col, valid, -10.0)
    np.testing.assert_array_equal(got, want)


def test_weak_match_labels_threshold():
    logits = jnp.full((2, 1, 2), -20.0)
    gts = M.weak_match_labels(
        logits, jnp.asarray([0, 0]), jnp.asarray([0, 0]),
        jnp.ones(2, bool), num_images=1, match_threshold=-10.0,
    )
    assert int(np.asarray(gts).sum()) == 0


def test_rpn_loss_runs_and_separates():
    rng = np.random.RandomState(5)
    n_anchor = 100
    anchors = np.concatenate(
        [rng.uniform(0, 80, (n_anchor, 2)), rng.uniform(20, 40, (n_anchor, 2))], 1
    ).astype(np.float32)
    anchors[:, 2:] += anchors[:, :2]
    gt = jnp.asarray([[10.0, 10.0, 45.0, 45.0], [0, 0, 0, 0]])
    gtv = jnp.asarray([True, False])
    obj = jnp.asarray(rng.randn(n_anchor).astype(np.float32))
    deltas = jnp.asarray(rng.randn(n_anchor, 4).astype(np.float32) * 0.1)
    lo, lb = D.rpn_loss(
        obj, deltas, jnp.asarray(anchors), gt, gtv, jax.random.PRNGKey(0),
        batch_size_per_image=32, positive_fraction=0.5, fg_iou=0.7, bg_iou=0.3,
    )
    assert np.isfinite(float(lo)) and np.isfinite(float(lb))
    assert float(lb) > 0
