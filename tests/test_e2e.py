"""End-to-end smokes on synthetic fixtures: SEAM phase-2 training epoch and
the MovingFashion retrieval eval, with a tiny detector."""

import os

import numpy as np
import jax
import pytest

from seam_match_rcnn_tpu.config import EvalConfig, ModelConfig, RPNConfig, RoIHeadsConfig, TransformConfig
from seam_match_rcnn_tpu.data.movingfashion import MovingFashionDataset, product_batches
from seam_match_rcnn_tpu.data.synthetic import make_synthetic_movingfashion
from seam_match_rcnn_tpu.eval.movingfashion import evaluate
from seam_match_rcnn_tpu.eval.runner import InferenceRunner
from seam_match_rcnn_tpu.models.matchrcnn import init_model
from seam_match_rcnn_tpu.train.engine import train_one_epoch_movingfashion
from seam_match_rcnn_tpu.train.optim import sgd
from seam_match_rcnn_tpu.train.seam import create_head_state, make_seam_head_step, merge_head_state


@pytest.fixture(scope="module")
def tiny_video_model():
    cfg = ModelConfig(
        rpn=RPNConfig(pre_nms_top_n_test=60, post_nms_top_n_test=80),
        roi_heads=RoIHeadsConfig(detections_per_img=8, score_thresh=0.01),
        transform=TransformConfig(min_size=96, max_size=128),
        compute_dtype="float32",
    )
    model, variables = init_model(cfg, video=True, canvas=(64, 64))
    return cfg, model, variables


@pytest.fixture(scope="module")
def mf_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("mf_e2e")
    path = make_synthetic_movingfashion(str(root), n_products=3, n_frames=10)
    return str(root), path


def test_eval_movingfashion_e2e(tiny_video_model, mf_root, tmp_path):
    cfg, model, variables = tiny_video_model
    root, path = mf_root
    ds = MovingFashionDataset(path, root=root, noise=False)

    def products():
        for k, items in enumerate(product_batches(ds, 1, 3, shuffle=False)):
            yield {
                "images": [items[0]["image"]] + [f["image"] for f in items[1:]],
                "tracklet_gt": [f["tracklet"] for f in items[1:]],
                "source": items[0]["source"],
                "key": items[0]["key"],
                "has_video": True,
            }

    runner = InferenceRunner(model, variables, chunk=4)
    r1, r2, r3 = evaluate(
        model, variables, products(),
        EvalConfig(score_threshold=0.0, frames_per_product=3,
                   first_n_withvideo=None, infer_chunk=4),
        runner=runner, out_dir=str(tmp_path / "logs_mf"),
    )
    for r in (r1, r2, r3):
        assert 0.0 <= r <= 1.0
    assert (tmp_path / "logs_mf" / "metrics.json").exists()


def test_eval_movingfashion_device_ingest_metric_parity(
        tiny_video_model, mf_root, tmp_path):
    """ingest='device' (raw frames uploaded, bilinear resize + canvas
    placement fused on device — models/transform.device_batch_images) must
    reproduce the host-cv2 ingest's retrieval metrics on the synthetic
    fixture (VERDICT r3 #5).  Replaces the reference's OpenCV-in-__getitem__
    host preprocessing (/root/reference/datasets/MFDataset.py:59-97)."""
    import json

    cfg, model, variables = tiny_video_model
    root, path = mf_root
    ds = MovingFashionDataset(path, root=root, noise=False)

    def products():
        for k, items in enumerate(product_batches(ds, 1, 3, shuffle=False)):
            yield {
                "images": [items[0]["image"]] + [f["image"] for f in items[1:]],
                "tracklet_gt": [f["tracklet"] for f in items[1:]],
                "source": items[0]["source"],
                "key": items[0]["key"],
                "has_video": True,
            }

    results = {}
    for ingest in ("host", "device"):
        runner = InferenceRunner(model, variables, chunk=4, ingest=ingest)
        out = str(tmp_path / f"logs_{ingest}")
        results[ingest] = (
            evaluate(model, variables, products(),
                     EvalConfig(score_threshold=0.0, frames_per_product=3,
                                first_n_withvideo=None, infer_chunk=4),
                     runner=runner, out_dir=out),
            json.load(open(f"{out}/metrics.json")),
        )
    (host_r, host_m), (dev_r, dev_m) = results["host"], results["device"]
    assert host_r == dev_r
    assert host_m == dev_m


def test_eval_multidf2_e2e(tiny_video_model, tmp_path):
    from seam_match_rcnn_tpu.cli.train_multidf2 import eval_products
    from seam_match_rcnn_tpu.data import convert as conv
    from seam_match_rcnn_tpu.data.multidf2 import MultiDeepFashion2Dataset
    from seam_match_rcnn_tpu.data.synthetic import make_synthetic_df2
    from seam_match_rcnn_tpu.eval.multidf2 import evaluate as eval_mdf2

    cfg, model, variables = tiny_video_model
    img_dir, ann_dir = make_synthetic_df2(str(tmp_path), n_products=3,
                                          views_per_side=2, image_size=(120, 150))
    ann = str(tmp_path / "annots.json")
    conv.convert(img_dir, ann_dir, ann)
    ds = MultiDeepFashion2Dataset(ann, img_dir, filter_onestreet=True)

    runner = InferenceRunner(model, variables, chunk=4)
    r1, r2, r3 = eval_mdf2(
        model, variables, eval_products(ds, 2, None),
        EvalConfig(score_threshold=0.0, frames_per_product=2,
                   first_n_withvideo=None, infer_chunk=4, tracking_threshold=0.7),
        runner=runner, out_dir=str(tmp_path / "logs_mdf2"),
    )
    for r in (r1, r2, r3):
        assert 0.0 <= r <= 1.0


def test_seam_epoch_e2e(tiny_video_model, mf_root):
    cfg, model, variables = tiny_video_model
    root, path = mf_root
    ds = MovingFashionDataset(path, root=root, noise=False)
    tx = sgd(lambda s: 0.01, momentum=0.9)
    head_state = create_head_state(variables, tx)
    head_step = make_seam_head_step(tx, frames_per_product=3, n_frames=2)
    runner = InferenceRunner(model, variables, chunk=4, with_match=False,
                             with_aggr_features=False, with_roi_features=True)
    head_state = train_one_epoch_movingfashion(
        model, variables, head_state, head_step, runner,
        product_batches(ds, n_products=3, frames_per_product=3, shuffle=False),
        epoch=1, n_products=3, frames_per_product=3,
        score_thresh=0.0, max_rows=64, print_freq=10,
    )
    assert int(head_state.step) >= 1
    merged = merge_head_state(variables, head_state)
    assert "temporal_aggregator" in merged["params"]


def test_descriptor_probe_drift_helpers(tiny_video_model):
    """tools/_synth_train.descriptor_probe + compare_probes — the
    sub-quantum drift stats the retrieval gates report alongside top-1
    flips (PERF.md round 4: the top-1 quantum is 1 product, so backend
    rounding noise needs a finer instrument).  Identical backends must
    report exactly zero drift; a perturbed descriptor set must not."""
    import sys

    # absolute path: the import must work when pytest runs from outside
    # the repo root (ADVICE r4)
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "tools"))
    from _synth_train import compare_probes, descriptor_probe

    cfg, model, variables = tiny_video_model
    rng = np.random.RandomState(5)
    images = [rng.rand(60, 80, 3).astype(np.float32) for _ in range(2)]
    a = descriptor_probe(model, variables, images)
    b = descriptor_probe(model, variables, images)
    stats = compare_probes(a, b)
    assert stats["n_detections"] > 0
    assert stats["desc_max_abs"] == 0.0 and stats["score_max_abs"] == 0.0
    b2 = dict(b, desc=b["desc"] + 0.25)
    assert compare_probes(a, b2)["desc_max_abs"] >= 0.25
    b3 = dict(b, desc=b["desc"][:-1])
    assert compare_probes(a, b3)["detection_sets_diverged"] is True


def test_rank_margin_instruments():
    """tools/_synth_train.margin_analysis + confusable_palette — the
    round-5 gate instruments (VERDICT r4 #2): flips are classified against
    the base margins, and the confusable palette really produces near-pair
    colors below the fixture noise."""
    import sys

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "tools"))
    from _synth_train import confusable_palette, margin_analysis

    pal = confusable_palette(64)
    assert len(pal) == 64
    arr = np.asarray(pal)
    assert arr.min() >= 0 and arr.max() <= 255
    # sibling pairs differ by exactly the confusion delta per channel
    diffs = np.abs(arr[0::2] - arr[1::2])
    assert (diffs == 40).all()
    # distinct pairs are far apart in expectation
    assert np.abs(arr[0] - arr[2]).max() > 40 or np.abs(
        arr[0] - arr[4]).max() > 40

    # margin_analysis: identical probes -> zero drift, zero flips
    base = {
        "scores": np.asarray([[2.0, 0.5, 0.1], [0.2, 1.5, 1.4],
                              [0.3, 0.2, 0.9]]),
        "ranks": np.asarray([0, 0, 0]),
        "margins": np.asarray([1.5, 0.1, 0.6]),
        "kept": [0, 1, 2],
    }
    same = margin_analysis(base, {k: (v.copy() if hasattr(v, "copy") else
                                      list(v)) for k, v in base.items()})
    assert same["n_flips"] == 0 and same["score_drift_max"] == 0.0
    assert same["top1_base"] == 1.0
    # a flip on the small-margin product reports its base margin
    other = dict(base, ranks=np.asarray([0, 1, 0]),
                 scores=base["scores"] + 0.01)
    an = margin_analysis(base, other)
    assert an["n_flips"] == 1
    assert an["flip_margins_base"] == [0.1]
    assert abs(an["score_drift_max"] - 0.01) < 1e-12
    assert an["top1_other"] < an["top1_base"]
    # diverged detection sets are reported, not crashed
    div = margin_analysis(base, {"kept": [0, 1]})
    assert div["detection_sets_diverged"] is True
