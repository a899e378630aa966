"""InferenceRunner with a data-sharded mesh matches the single-device path."""

import numpy as np
import pytest

from seam_match_rcnn_tpu.config import ModelConfig, RPNConfig, RoIHeadsConfig, TransformConfig
from seam_match_rcnn_tpu.eval.runner import InferenceRunner
from seam_match_rcnn_tpu.models.matchrcnn import init_model
from seam_match_rcnn_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def tiny():
    cfg = ModelConfig(
        rpn=RPNConfig(pre_nms_top_n_test=40, post_nms_top_n_test=48),
        roi_heads=RoIHeadsConfig(detections_per_img=5),
        transform=TransformConfig(min_size=64, max_size=96),
        compute_dtype="float32",
    )
    return init_model(cfg, video=True, canvas=(64, 64))


def test_sharded_runner_matches_single(tiny):
    model, variables = tiny
    rng = np.random.RandomState(0)
    images = [rng.rand(60, 80, 3).astype(np.float32) for _ in range(8)]

    single = InferenceRunner(model, variables, chunk=8)(images)
    mesh = make_mesh(data=8)
    sharded = InferenceRunner(model, variables, chunk=8, mesh=mesh)(images)

    for a, b in zip(single, sharded):
        np.testing.assert_allclose(a["boxes"], b["boxes"], rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(a["scores"], b["scores"], rtol=1e-4, atol=1e-4)
        np.testing.assert_array_equal(a["valid"], b["valid"])


def test_sharded_runner_pallas_backend(tiny):
    """pallas_call is not GSPMD-partitionable; the mesh path must shard_map
    around the kernels — this pins the serving-profile + mesh combination."""
    model0, variables = tiny
    from seam_match_rcnn_tpu.models.matchrcnn import MatchRCNN
    import dataclasses

    cfg_p = dataclasses.replace(
        model0.cfg,
        roi_heads=dataclasses.replace(
            model0.cfg.roi_heads, roi_align_backend="pallas"
        ),
    )
    model_p = MatchRCNN(cfg=cfg_p, video=True)
    rng = np.random.RandomState(1)
    images = [rng.rand(60, 80, 3).astype(np.float32) for _ in range(8)]

    single = InferenceRunner(model0, variables, chunk=8)(images)
    mesh = make_mesh(data=8)
    sharded = InferenceRunner(model_p, variables, chunk=8, mesh=mesh)(images)
    for a, b in zip(single, sharded):
        np.testing.assert_allclose(a["scores"], b["scores"], rtol=1e-3, atol=1e-3)
        np.testing.assert_array_equal(a["valid"], b["valid"])


def test_sharded_runner_resident_backend(tiny):
    """pallas_resident under the mesh runner: the tile-sorted kernel plus its
    in-graph unpermute must shard_map cleanly over 'data' (per-shard batch 1,
    per-shard roi sort) and match the single-device exact path."""
    model0, variables = tiny
    from seam_match_rcnn_tpu.models.matchrcnn import MatchRCNN
    import dataclasses

    cfg_r = dataclasses.replace(
        model0.cfg,
        roi_heads=dataclasses.replace(
            model0.cfg.roi_heads, roi_align_backend="pallas_resident"
        ),
    )
    model_r = MatchRCNN(cfg=cfg_r, video=True)
    rng = np.random.RandomState(2)
    images = [rng.rand(60, 80, 3).astype(np.float32) for _ in range(8)]

    single = InferenceRunner(model0, variables, chunk=8)(images)
    mesh = make_mesh(data=8)
    sharded = InferenceRunner(model_r, variables, chunk=8, mesh=mesh)(images)
    for a, b in zip(single, sharded):
        np.testing.assert_allclose(a["scores"], b["scores"], rtol=1e-3, atol=1e-3)
        np.testing.assert_array_equal(a["valid"], b["valid"])


def test_runner_run_default_device_keys(tiny):
    """run() on a default runner (with_roi_features=False) must not request
    the deleted 'roi_features' output — device_keys defaults from the
    constructor flag."""
    model, variables = tiny
    rng = np.random.RandomState(5)
    images = [rng.rand(60, 80, 3).astype(np.float32)]
    runner = InferenceRunner(model, variables, chunk=1)
    results, dev = runner.run(images)
    assert dev == {} and len(results) == 1
