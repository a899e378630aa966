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


def test_score_matrix_fp16_matches_reference_chain():
    """score_matrix(dtype='fp16') reproduces the reference's numpy-fp16
    scoring bit-for-bit (evaluate_movingfashion.py:94-121) and stays close
    to (but not necessarily identical with) the f32 device path."""
    import numpy as np

    from seam_match_rcnn_tpu.eval.gallery import score_matrix

    rng = np.random.RandomState(0)
    street = rng.randn(7, 256).astype(np.float32)
    shop = rng.randn(5, 256).astype(np.float32)
    w = rng.randn(2, 256).astype(np.float32) * 0.05
    b = rng.randn(2).astype(np.float32) * 0.05

    # the reference chain, written verbatim in numpy fp16
    sm = shop.astype(np.float16)
    stm = street.astype(np.float16)
    sq = (sm[np.newaxis] - stm[:, np.newaxis]) ** 2
    raw = sq @ w.transpose().astype(np.float16) + b.astype(np.float16)
    cls = np.exp(raw) / np.exp(raw).sum(2)[:, :, np.newaxis]
    want = cls[:, :, 1].astype(np.float32)

    got = score_matrix(street, shop, w, b, dtype="fp16")
    np.testing.assert_array_equal(got, want)

    f32 = score_matrix(street, shop, w, b)
    np.testing.assert_allclose(got, f32, atol=2e-3)


def test_evalconfig_gallery_dtype_reaches_scoring(monkeypatch):
    """EvalConfig(gallery_dtype='fp16') must flow into every score_matrix
    call of the MovingFashion harness (driven with a stub runner so the
    harness actually reaches the scoring phase)."""
    import numpy as np

    from seam_match_rcnn_tpu.config import EvalConfig
    from seam_match_rcnn_tpu.eval import movingfashion as mf

    seen = []
    orig = mf.score_matrix

    def spy(*a, **kw):
        seen.append(kw.get("dtype", "f32"))
        return orig(*a, **kw)

    monkeypatch.setattr(mf, "score_matrix", spy)

    rng = np.random.RandomState(0)

    def det(n):
        return {
            "scores": np.linspace(0.9, 0.5, n).astype(np.float32),
            "valid": np.ones(n, bool),
            "boxes": np.asarray([[1, 1, 20 + i, 30 + i] for i in range(n)],
                                np.float32),
            "match_features": rng.randn(n, 256).astype(np.float32),
            "aggr_features": rng.randn(n, 256).astype(np.float32),
        }

    def stub_runner(images):
        return [det(2) for _ in images]

    variables = {"params": {
        "match_predictor": {"last": {
            "kernel": rng.randn(256, 2).astype(np.float32) * 0.05,
            "bias": np.zeros(2, np.float32)}},
        "temporal_aggregator": {"last": {
            "kernel": rng.randn(256, 2).astype(np.float32) * 0.05,
            "bias": np.zeros(2, np.float32)}},
    }}
    products = [{
        "images": [np.zeros((32, 40, 3), np.float32)] * 4,
        "tracklet_gt": [np.asarray([1, 1, 20, 30], np.float32)] * 3,
        "source": 1,
        "key": "p0",
        "has_video": True,
    }]
    # the aggr-desc strategy calls model.apply on padded sequences; stub it
    monkeypatch.setattr(
        mf, "_aggregate_batch",
        lambda model, variables, seqs, mask: seqs.mean(axis=1))
    mf.evaluate(None, variables, products,
                cfg=EvalConfig(gallery_dtype="fp16", frames_per_product=3),
                runner=stub_runner, save_artifacts=False)
    assert len(seen) >= 3  # gallery, self-sim, avg/aggr scoring all ran
    assert all(d == "fp16" for d in seen)


def test_eval_scores_video_product_after_gallery_only(monkeypatch):
    """A gallery-only (has_video=False) product occupies a pidx slot, so a
    video product AFTER it sits at pidx >= count_street — it must still be
    scored (the per-product loop runs over gallery indices, not
    range(count_street))."""
    import numpy as np

    from seam_match_rcnn_tpu.config import EvalConfig
    from seam_match_rcnn_tpu.eval import movingfashion as mf

    rng = np.random.RandomState(1)
    f_match = rng.randn(256).astype(np.float32)  # video product's signature
    f_other = f_match + 5.0                      # gallery-only product's

    def det(feat, n=1):
        return {
            "scores": np.full(n, 0.9, np.float32),
            "valid": np.ones(n, bool),
            "boxes": np.tile(np.asarray([[1, 1, 20, 30]], np.float32),
                             (n, 1)),
            "match_features": np.tile(feat, (n, 1)),
            "aggr_features": np.tile(feat, (n, 1)),
        }

    def stub_runner(images):
        # 1 image = gallery-only shop; 1+T images = video product
        if len(images) == 1:
            return [det(f_other)]
        return [det(f_match) for _ in images]

    # (f_s - f_p)^2 @ W^T + b with W = [+1s; -1s]: identical features ->
    # logits (0, 0) -> score 0.5; distant features -> class-1 logit << 0
    w = np.stack([np.ones(256), -np.ones(256)], 0).astype(np.float32)
    variables = {"params": {
        "match_predictor": {"last": {"kernel": w.T,
                                     "bias": np.zeros(2, np.float32)}},
        "temporal_aggregator": {"last": {"kernel": w.T,
                                         "bias": np.zeros(2, np.float32)}},
    }}
    products = [
        {"images": [np.zeros((32, 40, 3), np.float32)],
         "tracklet_gt": [], "source": 1, "key": "g0", "has_video": False},
        {"images": [np.zeros((32, 40, 3), np.float32)] * 4,
         "tracklet_gt": [np.asarray([1, 1, 20, 30], np.float32)] * 3,
         "source": 1, "key": "p1", "has_video": True},
    ]
    monkeypatch.setattr(
        mf, "_aggregate_batch",
        lambda model, variables, seqs, mask: seqs.mean(axis=1))
    top1, top1_avg, top1_aggr = mf.evaluate(
        None, variables, products,
        cfg=EvalConfig(frames_per_product=3),
        runner=stub_runner, save_artifacts=False)
    # the video product's GT shop must rank first for every frame query
    assert top1 == 1.0 and top1_avg == 1.0


def test_multidf2_eval_scores_video_product_after_gallery_only(monkeypatch):
    """Same pidx-vs-count_street fix as the MovingFashion harness, for
    MultiDF2: a gallery-only product preceding a video product must not
    stop the video product's queries from being scored."""
    import numpy as np

    from seam_match_rcnn_tpu.config import EvalConfig
    from seam_match_rcnn_tpu.eval import multidf2 as md

    f_match = np.random.RandomState(2).randn(256).astype(np.float32)
    f_other = f_match + 5.0

    def det(feat, n=1):
        return {
            "scores": np.full(n, 0.9, np.float32),
            "valid": np.ones(n, bool),
            "boxes": np.tile(np.asarray([[1, 1, 20, 30]], np.float32),
                             (n, 1)),
            "match_features": np.tile(feat, (n, 1)),
            "aggr_features": np.tile(feat, (n, 1)),
        }

    def stub_runner(images):
        if len(images) == 1:
            return [det(f_other)]
        return [det(f_match) for _ in images]

    def target():
        return {
            "styles": np.asarray([1], np.int32),
            "pair_ids": np.asarray([7], np.int32),
            "boxes": np.asarray([[1, 1, 20, 30]], np.float32),
        }

    w = np.stack([np.ones(256), -np.ones(256)], 0).astype(np.float32)
    variables = {"params": {
        "match_predictor": {"last": {"kernel": w.T,
                                     "bias": np.zeros(2, np.float32)}},
        "temporal_aggregator": {"last": {"kernel": w.T,
                                         "bias": np.zeros(2, np.float32)}},
    }}
    products = [
        {"images": [np.zeros((32, 40, 3), np.float32)],
         "targets": [target()], "key": "1_7", "has_video": False},
        {"images": [np.zeros((32, 40, 3), np.float32)] * 4,
         "targets": [target()] * 4, "key": "1_7", "has_video": True},
    ]
    monkeypatch.setattr(
        md, "_aggregate_batch",
        lambda model, variables, seqs, mask: seqs.mean(axis=1))
    top1, top1_avg, top1_aggr = md.evaluate(
        None, variables, products,
        cfg=EvalConfig(score_threshold=0.0, tracking_threshold=0.7,
                       frames_per_product=3),
        runner=stub_runner, save_artifacts=False)
    assert top1 == 1.0 and top1_avg == 1.0 and top1_aggr == 1.0


def test_multidf2_eval_empty_detections_returns_zeros():
    """No usable detections must return (0,0,0) like the MF harness, not
    crash in np.stack."""
    import numpy as np

    from seam_match_rcnn_tpu.config import EvalConfig
    from seam_match_rcnn_tpu.eval import multidf2 as md

    def stub_runner(images):
        return [{
            "scores": np.zeros(1, np.float32),
            "valid": np.zeros(1, bool),
            "boxes": np.zeros((1, 4), np.float32),
            "match_features": np.zeros((1, 256), np.float32),
            "aggr_features": np.zeros((1, 256), np.float32),
        } for _ in images]

    variables = {"params": {
        "match_predictor": {"last": {"kernel": np.zeros((256, 2), np.float32),
                                     "bias": np.zeros(2, np.float32)}},
        "temporal_aggregator": {"last": {"kernel": np.zeros((256, 2), np.float32),
                                         "bias": np.zeros(2, np.float32)}},
    }}
    products = [{"images": [np.zeros((32, 40, 3), np.float32)] * 2,
                 "targets": [{"styles": np.asarray([1]),
                              "pair_ids": np.asarray([7]),
                              "boxes": np.asarray([[1, 1, 20, 30]],
                                                  np.float32)}] * 2,
                 "key": "1_7", "has_video": True}]
    out = md.evaluate(None, variables, products,
                      cfg=EvalConfig(score_threshold=0.5,
                                     tracking_threshold=0.7,
                                     frames_per_product=1),
                      runner=stub_runner, save_artifacts=False)
    assert out == (0.0, 0.0, 0.0)
