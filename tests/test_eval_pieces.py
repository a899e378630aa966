import numpy as np
import pytest

from seam_match_rcnn_tpu.eval.gallery import rank_of, score_matrix
from seam_match_rcnn_tpu.eval.tracking import build_tracklets, select_tracklet
from seam_match_rcnn_tpu.data.prefetch import prefetch
from seam_match_rcnn_tpu.utils.logging import MetricLogger, SmoothedValue


def test_score_matrix_matches_numpy_softmax():
    rng = np.random.RandomState(0)
    q, g = 13, 7
    street = rng.randn(q, 256).astype(np.float32)
    shop = rng.randn(g, 256).astype(np.float32)
    w = rng.randn(2, 256).astype(np.float32)
    b = rng.randn(2).astype(np.float32)
    got = score_matrix(street, shop, w, b, chunk=5)
    raw = ((street[:, None] - shop[None]) ** 2) @ w.T + b
    e = np.exp(raw - raw.max(-1, keepdims=True))
    want = (e / e.sum(-1, keepdims=True))[..., 1]
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_rank_of():
    scores = np.asarray([[0.1, 0.9, 0.5], [0.9, 0.2, 0.3]])
    assert rank_of(scores, 1).tolist() == [0, 2]


def test_tracklets_single_object_one_track():
    # 3 frames x 1 box, all highly similar
    sim = np.full((3, 3), 0.9, np.float32)
    det = np.asarray([0.9, 0.8, 0.7])
    imgs = np.asarray([0, 1, 2])
    tracks = build_tracklets(sim, det, imgs, 0.3)
    assert len(tracks) == 1 and sorted(tracks[0]) == [0, 1, 2]


def test_tracklets_split_below_threshold():
    # two dissimilar boxes per frame -> two tracks
    sim = np.asarray([
        [1.0, 0.05, 0.9, 0.05],
        [0.05, 1.0, 0.05, 0.9],
        [0.9, 0.05, 1.0, 0.05],
        [0.05, 0.9, 0.05, 1.0],
    ], np.float32)
    det = np.asarray([0.9, 0.85, 0.8, 0.75])
    imgs = np.asarray([0, 0, 1, 1])
    tracks = build_tracklets(sim, det, imgs, 0.3)
    assert len(tracks) == 2
    assert sorted(sorted(t) for t in tracks) == [[0, 2], [1, 3]]


def test_select_tracklet_by_gt_iou():
    tracks = [[0], [1]]
    boxes = np.asarray([[0, 0, 10, 10], [50, 50, 60, 60]], np.float32)
    imgs = np.asarray([0, 0])
    gt = np.asarray([[49, 49, 61, 61]], np.float32)  # frame 0 GT near box 1
    assert select_tracklet(tracks, boxes, imgs, gt) == 1


def test_prefetcher_order_and_errors():
    assert list(prefetch(range(5), depth=2)) == [0, 1, 2, 3, 4]
    assert list(prefetch(range(4), transform=lambda x: x * 2)) == [0, 2, 4, 6]

    def bad():
        yield 1
        raise ValueError("boom")

    it = prefetch(bad())
    assert next(it) == 1
    with pytest.raises(ValueError):
        list(it)


def test_metric_logger_smoothing():
    m = SmoothedValue(window_size=2)
    for v in (1.0, 2.0, 3.0):
        m.update(v)
    assert m.median == 2.5
    assert m.global_avg == pytest.approx(2.0)
    logger = MetricLogger()
    logger.update(loss=1.0)
    assert "loss" in str(logger)
    out = list(logger.log_every(range(3), print_freq=2, header="t", total=3))
    assert out == [0, 1, 2]
