import numpy as np
import jax.numpy as jnp
import pytest

from seam_match_rcnn_tpu.ops.nms import batched_nms_padded, nms_padded
from tests.reference_impls import nms_ref


def make_boxes(n, seed, size=200.0):
    rng = np.random.RandomState(seed)
    xy = rng.uniform(0, size, (n, 2))
    wh = rng.uniform(5, 60, (n, 2))
    boxes = np.concatenate([xy, xy + wh], axis=1).astype(np.float32)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    return boxes, scores


@pytest.mark.parametrize("n,thresh,tile", [(50, 0.5, 16), (300, 0.7, 64), (1000, 0.5, 256)])
def test_nms_exact_vs_greedy(n, thresh, tile):
    boxes, scores = make_boxes(n, seed=n)
    want = nms_ref(boxes, scores, thresh)
    idx, mask = nms_padded(
        jnp.asarray(boxes), jnp.asarray(scores), thresh, max_output=n, tile_size=tile
    )
    got = np.asarray(idx)[np.asarray(mask)]
    np.testing.assert_array_equal(got, want)


def test_nms_max_output_truncates():
    boxes, scores = make_boxes(200, seed=9)
    want = nms_ref(boxes, scores, 0.5)[:10]
    idx, mask = nms_padded(jnp.asarray(boxes), jnp.asarray(scores), 0.5, max_output=10)
    assert mask.all()
    np.testing.assert_array_equal(np.asarray(idx), want)


def test_nms_valid_mask_excludes():
    boxes, scores = make_boxes(100, seed=11)
    valid = np.ones(100, dtype=bool)
    valid[::3] = False
    want = nms_ref(boxes[valid], scores[valid], 0.5)
    want_orig = np.arange(100)[valid][want]
    idx, mask = nms_padded(
        jnp.asarray(boxes), jnp.asarray(scores), 0.5, max_output=100, valid=jnp.asarray(valid)
    )
    got = np.asarray(idx)[np.asarray(mask)]
    np.testing.assert_array_equal(got, want_orig)


def test_nms_identical_boxes_chain():
    # Pathological chain: every box overlaps the next; exactness requires the
    # fixpoint iteration to fully converge.
    n = 64
    boxes = np.stack(
        [np.arange(n) * 5.0, np.zeros(n), np.arange(n) * 5.0 + 20.0, np.full(n, 20.0)],
        axis=1,
    ).astype(np.float32)
    scores = np.linspace(1.0, 0.1, n).astype(np.float32)
    want = nms_ref(boxes, scores, 0.3)
    idx, mask = nms_padded(jnp.asarray(boxes), jnp.asarray(scores), 0.3, max_output=n, tile_size=16)
    np.testing.assert_array_equal(np.asarray(idx)[np.asarray(mask)], want)


def test_batched_nms_respects_categories():
    boxes = np.tile(np.array([[0.0, 0.0, 10.0, 10.0]], dtype=np.float32), (4, 1))
    scores = np.array([0.9, 0.8, 0.7, 0.6], dtype=np.float32)
    idxs = np.array([0, 0, 1, 1], dtype=np.int32)
    out, mask = batched_nms_padded(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(idxs), 0.5, max_output=4,
        valid=jnp.ones(4, dtype=bool),
    )
    got = np.asarray(out)[np.asarray(mask)]
    # one box per category survives, score order
    np.testing.assert_array_equal(got, [0, 2])


def test_nms_kept_mask_matches_nms_padded():
    from seam_match_rcnn_tpu.ops.nms import nms_kept_mask

    boxes, scores = make_boxes(400, seed=9)
    valid = np.ones(400, bool)
    valid[::7] = False
    idx, mask = nms_padded(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 400,
                           valid=jnp.asarray(valid), tile_size=64)
    kept = nms_kept_mask(jnp.asarray(boxes), jnp.asarray(scores), 0.5,
                         valid=jnp.asarray(valid), tile_size=64)
    survivors = set(np.asarray(idx)[np.asarray(mask)].tolist())
    assert survivors == set(np.nonzero(np.asarray(kept))[0].tolist())


def test_per_level_nms_equals_offset_trick():
    """The RPN's per-level-segment NMS + global top-k (models/rpn.py) must
    select the same survivor set as torchvision-style offset batched NMS."""
    from seam_match_rcnn_tpu.ops.nms import nms_kept_mask

    rng = np.random.RandomState(3)
    segs = [120, 80, 40]
    boxes_l, scores_l = [], []
    for i, n in enumerate(segs):
        b, s = make_boxes(n, seed=10 + i)
        boxes_l.append(b)
        scores_l.append(s)
    boxes = np.concatenate(boxes_l)
    scores = np.concatenate(scores_l)
    levels = np.concatenate([np.full(n, i) for i, n in enumerate(segs)])

    idx, mask = batched_nms_padded(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(levels), 0.6,
        sum(segs), tile_size=64)
    want = set(np.asarray(idx)[np.asarray(mask)].tolist())

    kept = []
    off = 0
    for n in segs:
        kept.append(np.asarray(nms_kept_mask(
            jnp.asarray(boxes[off:off + n]), jnp.asarray(scores[off:off + n]),
            0.6, tile_size=64)))
        off += n
    got = set(np.nonzero(np.concatenate(kept))[0].tolist())
    assert got == want


def test_nms_zero_boxes_static_shape():
    """A zero-sized level segment is a legal static shape: the tile size
    clamps to 8 instead of a div-by-zero at trace time."""
    from seam_match_rcnn_tpu.ops.nms import nms_padded

    idx, valid = nms_padded(
        jnp.zeros((0, 4), jnp.float32), jnp.zeros((0,), jnp.float32),
        iou_threshold=0.5, max_output=4)
    assert idx.shape == (4,) and not np.asarray(valid).any()
