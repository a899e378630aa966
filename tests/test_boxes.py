import numpy as np
import jax.numpy as jnp

from seam_match_rcnn_tpu.ops import boxes as B


def rand_boxes(n, size=500.0, seed=0):
    rng = np.random.RandomState(seed)
    xy = rng.uniform(0, size, (n, 2))
    wh = rng.uniform(1, size / 2, (n, 2))
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


def test_box_iou_matches_numpy():
    b1, b2 = rand_boxes(17, seed=1), rand_boxes(23, seed=2)
    got = np.asarray(B.box_iou(jnp.asarray(b1), jnp.asarray(b2)))
    a1 = (b1[:, 2] - b1[:, 0]) * (b1[:, 3] - b1[:, 1])
    a2 = (b2[:, 2] - b2[:, 0]) * (b2[:, 3] - b2[:, 1])
    lt = np.maximum(b1[:, None, :2], b2[None, :, :2])
    rb = np.minimum(b1[:, None, 2:], b2[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    want = inter / (a1[:, None] + a2[None] - inter)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_encode_decode_roundtrip():
    props = rand_boxes(40, seed=3)
    gts = rand_boxes(40, seed=4)
    w = (10.0, 10.0, 5.0, 5.0)
    deltas = B.encode_boxes(jnp.asarray(gts), jnp.asarray(props), w)
    rec = np.asarray(B.decode_boxes(deltas, jnp.asarray(props), w))
    np.testing.assert_allclose(rec, gts, rtol=1e-3, atol=1e-2)


def test_decode_clamps_large_deltas():
    props = rand_boxes(4, seed=5)
    deltas = jnp.full((4, 4), 100.0)
    out = np.asarray(B.decode_boxes(deltas, jnp.asarray(props), (1, 1, 1, 1)))
    assert np.isfinite(out).all()


def test_clip_and_small_mask():
    bx = jnp.asarray([[-5.0, -5.0, 10.0, 10.0], [0.0, 0.0, 0.001, 50.0]])
    clipped = np.asarray(B.clip_boxes_to_image(bx, (8, 8)))
    assert clipped.min() >= 0 and clipped.max() <= 8
    keep = np.asarray(B.small_box_mask(bx, 1e-2))
    assert keep.tolist() == [True, False]


def test_box_iou_xywh_matches_xyxy():
    b1, b2 = rand_boxes(5, seed=6), rand_boxes(7, seed=7)
    xywh1 = np.concatenate([b1[:, :2], b1[:, 2:] - b1[:, :2]], axis=1)
    xywh2 = np.concatenate([b2[:, :2], b2[:, 2:] - b2[:, :2]], axis=1)
    got = np.asarray(B.box_iou_xywh(jnp.asarray(xywh1), jnp.asarray(xywh2)))
    want = np.asarray(B.box_iou(jnp.asarray(b1), jnp.asarray(b2)))
    np.testing.assert_allclose(got, want, rtol=1e-5)
