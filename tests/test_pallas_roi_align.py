"""Pallas RoIAlign vs the exact XLA implementation (interpret mode).

Agreement is exact (up to float assoc.) whenever a roi's footprint at its
FPN level fits the start-aligned 40x48 window (footprints to ~37 cells —
aspect ≤ ~1.75 at the very top of the level-mapper band, everything below);
larger footprints clamp to the patch edge
(documented approximation; the XLA path is exact and remains the default).
"""

import numpy as np
import jax.numpy as jnp

from seam_match_rcnn_tpu.ops.pallas_roi_align import (
    pallas_multilevel_roi_align,
    quantize_features_int8,
)
from seam_match_rcnn_tpu.ops.roi_align import multilevel_roi_align


def make_pyramid(seed, c=8, base=(64, 96)):
    rng = np.random.RandomState(seed)
    feats = []
    h, w = base
    for _ in range(4):
        feats.append(rng.randn(h, w, c).astype(np.float32))
        h, w = max(h // 2, 1), max(w // 2, 1)
    return feats


def moderate_rois(n, img_hw=(256, 384), seed=0, max_aspect=2.0):
    rng = np.random.RandomState(seed)
    h, w = img_hw
    rois = []
    for _ in range(n):
        side = rng.uniform(8, 200)
        a = rng.uniform(1.0 / max_aspect, max_aspect)
        bw = side * np.sqrt(a)
        bh = side / np.sqrt(a)
        x1 = rng.uniform(0, max(w - bw, 1))
        y1 = rng.uniform(0, max(h - bh, 1))
        rois.append([x1, y1, min(x1 + bw, w), min(y1 + bh, h)])
    return np.asarray(rois, np.float32)


def test_pallas_roi_align_matches_xla():
    feats = [jnp.asarray(f) for f in make_pyramid(seed=1)]
    rois = jnp.asarray(moderate_rois(24, seed=2))
    want = np.asarray(multilevel_roi_align(feats, rois, 7, 2, roi_chunk=8))
    got = np.asarray(pallas_multilevel_roi_align(feats, rois, 7, 2, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_pallas_roi_align_mask_size():
    feats = [jnp.asarray(f) for f in make_pyramid(seed=3)]
    rois = jnp.asarray(moderate_rois(8, seed=4))
    want = np.asarray(multilevel_roi_align(feats, rois, 14, 2, roi_chunk=8))
    got = np.asarray(pallas_multilevel_roi_align(feats, rois, 14, 2, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_pallas_roi_align_border_boxes():
    feats = [jnp.asarray(f) for f in make_pyramid(seed=5)]
    rois = jnp.asarray([
        [0.0, 0.0, 30.0, 40.0],            # top-left corner
        [350.0, 220.0, 384.0, 256.0],      # bottom-right corner
        [0.0, 0.0, 384.0, 256.0],          # whole image (level 3)
        [5.0, 5.0, 6.0, 6.0],              # tiny
    ])
    want = np.asarray(multilevel_roi_align(feats, rois, 7, 2, roi_chunk=4))
    got = np.asarray(pallas_multilevel_roi_align(feats, rois, 7, 2, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_pallas_roi_align_stress_random():
    feats = [jnp.asarray(f) for f in make_pyramid(seed=11, base=(80, 120))]
    rois = jnp.asarray(moderate_rois(96, img_hw=(320, 480), seed=12, max_aspect=1.6))
    want = np.asarray(multilevel_roi_align(feats, rois, 7, 2, roi_chunk=32))
    got = np.asarray(pallas_multilevel_roi_align(feats, rois, 7, 2, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_quantize_features_int8_roundtrip():
    feats = [jnp.asarray(f) for f in make_pyramid(seed=21)]
    qs, scales = quantize_features_int8(feats)
    assert scales.shape == (4, feats[0].shape[-1])
    for lv, (q, f) in enumerate(zip(qs, feats)):
        assert q.dtype == jnp.int8
        deq = np.asarray(q, np.float32) * np.asarray(scales)[lv]
        maxabs = np.abs(np.asarray(f)).max(axis=(0, 1))
        err = np.abs(deq - np.asarray(f)).max(axis=(0, 1))
        assert (err <= maxabs / 127.0 * 0.51 + 1e-6).all()


def test_pallas_roi_align_int8_close_to_exact():
    feats = [jnp.asarray(f) for f in make_pyramid(seed=22)]
    rois = jnp.asarray(moderate_rois(24, seed=23))
    want = np.asarray(multilevel_roi_align(feats, rois, 7, 2, roi_chunk=8))
    qs, scales = quantize_features_int8(feats)
    got = np.asarray(
        pallas_multilevel_roi_align(qs, rois, 7, 2, interpret=True, scales=scales)
    )
    # Error budget: feature quantization ≤ maxabs/254 per channel, plus the
    # int8-quantized pooling operator (≤ 0.5/127 per weight entry over the
    # ≤16 active entries of a row, values bounded by the channel maxabs):
    # both O(maxabs/127); 2.5 scales covers the sum with slack.
    tol = np.abs(np.asarray(scales)).max() * 2.5 + 1e-6
    np.testing.assert_allclose(got, want, atol=tol)
    assert np.abs(got - want).max() > 0  # actually quantized, not a no-op


def test_pick_mini_respects_vmem_budget():
    from seam_match_rcnn_tpu.ops.pallas_roi_align import (
        MINI, PATCH, PATCH_W, _pick_mini,
    )
    for c, itemsize in [(256, 4), (256, 2), (256, 1), (8, 4), (1024, 4)]:
        m = _pick_mini(c, itemsize)
        assert 1 <= m <= MINI and MINI % m == 0
        assert m == 1 or m * PATCH * PATCH_W * c * itemsize <= 8 * 1024 * 1024
    assert _pick_mini(256, 2) == 8   # bf16 serving shape keeps full groups
    assert _pick_mini(256, 4) == 4   # f32 x 256ch OOMed scoped VMEM at 8


def test_pallas_roi_align_f32_256ch_small_mini():
    # exercises the mini<8 geom-row padding path end-to-end
    feats = [jnp.asarray(f) for f in make_pyramid(seed=31, c=256)]
    rois = jnp.asarray(moderate_rois(16, seed=32))
    want = np.asarray(multilevel_roi_align(feats, rois, 7, 2, roi_chunk=8))
    got = np.asarray(pallas_multilevel_roi_align(feats, rois, 7, 2, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_serving_config_selects_pallas_backend():
    from seam_match_rcnn_tpu.config import (
        ModelConfig, fast_eval_model_config, serving_model_config,
    )
    assert serving_model_config().roi_heads.roi_align_backend == "pallas"
    assert fast_eval_model_config().roi_heads.roi_align_backend == "pallas"
    assert ModelConfig().roi_heads.roi_align_backend == "xla"
    assert serving_model_config().rpn.post_nms_top_n_test == 4000  # parity
    assert fast_eval_model_config().rpn.post_nms_top_n_test == 1000


def test_pallas_roi_align_bf16_inputs():
    feats = [jnp.asarray(f, jnp.bfloat16) for f in make_pyramid(seed=6)]
    rois = jnp.asarray(moderate_rois(6, seed=7))
    want = np.asarray(
        multilevel_roi_align(feats, rois, 7, 2, roi_chunk=4)
    ).astype(np.float32)
    got = np.asarray(pallas_multilevel_roi_align(feats, rois, 7, 2, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_pallas_trainable_grads_match_exact():
    """pallas_roi_align_trainable: forward equals the exact path (moderate
    boxes) and its custom backward IS the exact path's adjoint."""
    import jax
    from seam_match_rcnn_tpu.ops.pallas_roi_align import (
        pallas_roi_align_trainable,
    )
    from seam_match_rcnn_tpu.ops.roi_align import batched_multilevel_roi_align

    feats = tuple(jnp.asarray(f)[None] for f in make_pyramid(seed=41))
    rois = jnp.asarray(moderate_rois(12, seed=42))[None]

    def loss_p(fs):
        out = pallas_roi_align_trainable(fs, rois, 7, 2)
        return jnp.sum(jnp.sin(out))

    def loss_x(fs):
        out = batched_multilevel_roi_align(
            list(fs), rois, 7, sampling_ratio=2
        ).astype(jnp.float32)
        return jnp.sum(jnp.sin(out))

    lp, gp = jax.value_and_grad(loss_p)(feats)
    lx, gx = jax.value_and_grad(loss_x)(feats)
    np.testing.assert_allclose(float(lp), float(lx), rtol=1e-4)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
