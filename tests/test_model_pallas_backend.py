"""Full-model forward with the pallas RoIAlign backend (interpret on CPU)
vs the default XLA backend — same detections and descriptors for
moderate-aspect boxes."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import seam_match_rcnn_tpu.ops.pallas_roi_align as pra
from seam_match_rcnn_tpu.config import ModelConfig, RPNConfig, RoIHeadsConfig
from seam_match_rcnn_tpu.models.matchrcnn import MatchRCNN, init_model


@pytest.fixture(autouse=True)
def interpret_pallas(monkeypatch):
    orig = pra.pallas_roi_align_batched

    def wrapped(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(pra, "pallas_roi_align_batched", wrapped)


def test_pallas_backend_matches_xla_forward():
    kw = dict(
        rpn=RPNConfig(pre_nms_top_n_test=60, post_nms_top_n_test=80),
        compute_dtype="float32",
    )
    cfg_x = ModelConfig(roi_heads=RoIHeadsConfig(detections_per_img=6), **kw)
    cfg_p = ModelConfig(
        roi_heads=RoIHeadsConfig(detections_per_img=6, roi_align_backend="pallas"),
        **kw,
    )
    model_x, variables = init_model(cfg_x, video=True, canvas=(96, 128))
    model_p = MatchRCNN(cfg=cfg_p, video=True)

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(1, 96, 128, 3).astype(np.float32))
    sizes = jnp.asarray([[96, 128]], jnp.int32)
    out_x = model_x.apply(variables, images, sizes, method=MatchRCNN.inference)
    out_p = model_p.apply(variables, images, sizes, method=MatchRCNN.inference)

    np.testing.assert_allclose(
        np.asarray(out_x["boxes"]), np.asarray(out_p["boxes"]), rtol=1e-3, atol=1e-2
    )
    v = np.asarray(out_x["valid"][0])
    np.testing.assert_allclose(
        np.asarray(out_x["match_features"][0])[v],
        np.asarray(out_p["match_features"][0])[v],
        rtol=2e-2, atol=2e-2,
    )


def test_pallas_int8_backend_forward_close():
    """pallas_int8 (per-channel int8 pyramid, once-per-forward quantization
    threaded through box+mask roi calls) stays close to the exact forward."""
    kw = dict(
        rpn=RPNConfig(pre_nms_top_n_test=60, post_nms_top_n_test=80),
        compute_dtype="float32",
    )
    cfg_x = ModelConfig(roi_heads=RoIHeadsConfig(detections_per_img=6), **kw)
    cfg_q = ModelConfig(
        roi_heads=RoIHeadsConfig(detections_per_img=6,
                                 roi_align_backend="pallas_int8"),
        **kw,
    )
    model_x, variables = init_model(cfg_x, video=True, canvas=(96, 128))
    model_q = MatchRCNN(cfg=cfg_q, video=True)

    rng = np.random.RandomState(1)
    images = jnp.asarray(rng.rand(1, 96, 128, 3).astype(np.float32))
    sizes = jnp.asarray([[96, 128]], jnp.int32)
    out_x = model_x.apply(variables, images, sizes, method=MatchRCNN.inference)
    out_q = model_q.apply(variables, images, sizes, method=MatchRCNN.inference)
    np.testing.assert_allclose(
        np.asarray(out_x["scores"]), np.asarray(out_q["scores"]),
        rtol=5e-2, atol=5e-2,
    )
    v = np.asarray(out_x["valid"][0])
    # int8 budget: feature quantization (≤ maxabs/254/channel) PLUS the
    # int8-quantized pooling operator (≤ 0.5/127 per active weight entry),
    # both amplified through the match trunk's convs — descriptors are O(1)
    # valued, so compare at an absolute 0.25 band (typical max ≈ 0.18).
    np.testing.assert_allclose(
        np.asarray(out_x["match_features"][0])[v],
        np.asarray(out_q["match_features"][0])[v],
        rtol=1e-1, atol=2.5e-1,
    )


def test_pallas_resident_backend_matches_xla_forward():
    """pallas_resident (tile-resident kernel): the box branch runs on
    tile-sorted pooled features and unpermutes the head outputs; the mask
    branch unpermutes the pooled features.  f32 pools at Precision.HIGHEST,
    so the full forward must match the exact XLA backend tightly."""
    kw = dict(
        rpn=RPNConfig(pre_nms_top_n_test=60, post_nms_top_n_test=80),
        compute_dtype="float32",
    )
    cfg_x = ModelConfig(roi_heads=RoIHeadsConfig(detections_per_img=6), **kw)
    cfg_r = ModelConfig(
        roi_heads=RoIHeadsConfig(detections_per_img=6,
                                 roi_align_backend="pallas_resident"),
        **kw,
    )
    model_x, variables = init_model(cfg_x, video=True, canvas=(96, 128))
    model_r = MatchRCNN(cfg=cfg_r, video=True)

    rng = np.random.RandomState(2)
    images = jnp.asarray(rng.rand(1, 96, 128, 3).astype(np.float32))
    sizes = jnp.asarray([[96, 128]], jnp.int32)
    out_x = model_x.apply(variables, images, sizes, method=MatchRCNN.inference)
    out_r = model_r.apply(variables, images, sizes, method=MatchRCNN.inference)

    np.testing.assert_allclose(
        np.asarray(out_x["boxes"]), np.asarray(out_r["boxes"]),
        rtol=1e-4, atol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(out_x["scores"]), np.asarray(out_r["scores"]),
        rtol=1e-4, atol=1e-4,
    )
    v = np.asarray(out_x["valid"][0])
    np.testing.assert_allclose(
        np.asarray(out_x["match_features"][0])[v],
        np.asarray(out_r["match_features"][0])[v],
        rtol=1e-3, atol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(out_x["masks"][0])[v],
        np.asarray(out_r["masks"][0])[v],
        rtol=1e-3, atol=1e-3,
    )


def test_pallas_resident_fixup_budget_path():
    """fixup_budget > 0 routes the box branch through the generic unpermute
    path (apply_exact_fixup needs original-order pooled features) — the
    forward must still match."""
    kw = dict(
        rpn=RPNConfig(pre_nms_top_n_test=40, post_nms_top_n_test=48),
        compute_dtype="float32",
    )
    cfg_x = ModelConfig(roi_heads=RoIHeadsConfig(detections_per_img=4), **kw)
    cfg_r = ModelConfig(
        roi_heads=RoIHeadsConfig(detections_per_img=4,
                                 roi_align_backend="pallas_resident",
                                 roi_align_fixup_budget=8),
        **kw,
    )
    model_x, variables = init_model(cfg_x, video=False, canvas=(96, 128))
    model_r = MatchRCNN(cfg=cfg_r, video=False)

    rng = np.random.RandomState(3)
    images = jnp.asarray(rng.rand(1, 96, 128, 3).astype(np.float32))
    sizes = jnp.asarray([[96, 128]], jnp.int32)
    out_x = model_x.apply(variables, images, sizes, method=MatchRCNN.inference)
    out_r = model_r.apply(variables, images, sizes, method=MatchRCNN.inference)
    np.testing.assert_allclose(
        np.asarray(out_x["boxes"]), np.asarray(out_r["boxes"]),
        rtol=1e-4, atol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(out_x["scores"]), np.asarray(out_r["scores"]),
        rtol=1e-4, atol=1e-4,
    )


def test_resident_roi_chunk_capped_for_small_streams(monkeypatch):
    """_resident_roi caps the kernel's roi_chunk at the (static) roi count
    rounded to MINI=8 — a ~100-roi mask/match stream must not be padded to
    the 2048-roi serving default (the pad rois would be pooled for real)."""
    import seam_match_rcnn_tpu.models.matchrcnn as m
    from seam_match_rcnn_tpu.ops import pallas_roi_align_resident as res

    captured = {}
    real = res.pallas_roi_align_resident

    def spy(*args, **kwargs):
        captured["roi_chunk"] = kwargs.get("roi_chunk")
        return real(*args, **kwargs)

    monkeypatch.setattr(res, "pallas_roi_align_resident", spy)

    cfg = ModelConfig(
        roi_heads=RoIHeadsConfig(roi_align_backend="pallas_resident"),
        compute_dtype="float32",
    )
    model = MatchRCNN(cfg=cfg, video=False)
    rng = np.random.RandomState(4)
    shapes = [(24, 32), (12, 16), (6, 8), (3, 4)]
    feats = [jnp.asarray(rng.randn(2, h, w, 8).astype(np.float32))
             for h, w in shapes]
    rois = jnp.asarray(
        rng.uniform(4, 40, (2, 13, 4)).astype(np.float32))
    rois = rois.at[..., 2:].set(rois[..., :2] + rois[..., 2:])

    out = model.apply({}, feats, rois, 7, 500, method=MatchRCNN._roi_align)
    assert out.shape == (2, 13, 7, 7, 8)
    assert captured["roi_chunk"] == 32  # 26 rois -> next multiple of 8
