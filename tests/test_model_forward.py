import numpy as np
import jax
import jax.numpy as jnp
import pytest

from seam_match_rcnn_tpu.config import ModelConfig, RPNConfig, RoIHeadsConfig
from seam_match_rcnn_tpu.models.anchors import grid_anchors
from seam_match_rcnn_tpu.models.matchrcnn import MatchRCNN, init_model


def tiny_cfg(**kw):
    return ModelConfig(
        rpn=RPNConfig(
            pre_nms_top_n_train=200, pre_nms_top_n_test=100,
            post_nms_top_n_train=300, post_nms_top_n_test=150,
        ),
        roi_heads=RoIHeadsConfig(detections_per_img=20),
        compute_dtype="float32",
        **kw,
    )


def test_anchor_counts_and_values():
    anchors = grid_anchors((64, 64), ((16, 16), (8, 8)), (32.0, 64.0), (0.5, 1.0, 2.0))
    assert anchors[0].shape == (16 * 16 * 3, 4)
    assert anchors[1].shape == (8 * 8 * 3, 4)
    # first anchor of ratio 1.0 at origin for size 32: [-16,-16,16,16]
    np.testing.assert_array_equal(anchors[0][1], [-16, -16, 16, 16])
    # anchors shift with stride 4 along x
    np.testing.assert_array_equal(anchors[0][3] - anchors[0][0], [4, 0, 4, 0])


@pytest.fixture(scope="module")
def small_model():
    cfg = tiny_cfg()
    model, variables = init_model(cfg, video=True, canvas=(128, 160))
    return cfg, model, variables


def test_inference_shapes_and_masks(small_model):
    cfg, model, variables = small_model
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(2, 128, 160, 3).astype(np.float32))
    sizes = jnp.asarray([[128, 160], [96, 120]], jnp.int32)
    out = model.apply(variables, images, sizes, method=MatchRCNN.inference)
    d = cfg.roi_heads.detections_per_img
    assert out["boxes"].shape == (2, d, 4)
    assert out["scores"].shape == (2, d)
    assert out["masks"].shape == (2, d, 28, 28)
    assert out["match_features"].shape == (2, d, 256)
    assert out["roi_features"].shape == (2, d, 14, 14, 256)
    assert np.isfinite(np.asarray(out["boxes"])).all()
    assert np.isfinite(np.asarray(out["match_features"])).all()
    # at least the fallback box is valid
    assert np.asarray(out["valid"]).any(axis=1).all()
    # boxes respect per-image valid size
    b = np.asarray(out["boxes"])
    v = np.asarray(out["valid"])
    assert (b[1][v[1]][:, 2] <= 120 + 1e-3).all()
    assert (b[1][v[1]][:, 3] <= 96 + 1e-3).all()


def test_inference_gt_prepend(small_model):
    cfg, model, variables = small_model
    images = jnp.zeros((1, 128, 160, 3), jnp.float32)
    sizes = jnp.asarray([[128, 160]], jnp.int32)
    gt = {
        "boxes": jnp.asarray([[[10.0, 10.0, 50.0, 60.0], [0, 0, 0, 0]]]),
        "labels": jnp.asarray([[3, 0]], jnp.int32),
        "valid": jnp.asarray([[True, False]]),
    }
    out = model.apply(variables, images, sizes, gt, method=MatchRCNN.inference)
    assert out["boxes"].shape[1] == cfg.roi_heads.detections_per_img + 2
    np.testing.assert_allclose(np.asarray(out["boxes"][0, 0]), [10, 10, 50, 60])
    assert float(out["scores"][0, 0]) == 1.0
    assert bool(out["valid"][0, 0])
    assert not bool(out["valid"][0, 1])


def test_fallback_box_on_empty(small_model):
    # With an all-black image and random-ish weights, some image may produce
    # no detection above threshold; force it by raising score_thresh.
    cfg = tiny_cfg(num_classes=14)
    cfg = ModelConfig(
        rpn=cfg.rpn,
        roi_heads=RoIHeadsConfig(detections_per_img=10, score_thresh=2.0),
        compute_dtype="float32",
    )
    model, variables = init_model(cfg, video=True, canvas=(64, 64))
    images = jnp.zeros((1, 64, 64, 3), jnp.float32)
    sizes = jnp.asarray([[60, 64]], jnp.int32)
    out = model.apply(
        variables, images, sizes, method=MatchRCNN.inference,
    )
    assert bool(out["valid"][0, 0])
    np.testing.assert_allclose(np.asarray(out["boxes"][0, 0]), [0, 0, 64, 60])
    assert float(out["scores"][0, 0]) == pytest.approx(0.1)  # video fallback
    assert int(np.asarray(out["valid"][0]).sum()) == 1
