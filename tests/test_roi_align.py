import numpy as np
import jax.numpy as jnp
import pytest

from seam_match_rcnn_tpu.ops.roi_align import (
    batched_multilevel_roi_align,
    fpn_level_indices,
    multilevel_roi_align,
)
from tests.reference_impls import level_map_ref, roi_align_ref


def make_pyramid(seed, c=8, base=(32, 48)):
    rng = np.random.RandomState(seed)
    feats = []
    h, w = base
    for _ in range(4):
        feats.append(rng.randn(h, w, c).astype(np.float32))
        h, w = max(h // 2, 1), max(w // 2, 1)
    return feats


def rand_rois(n, img_hw=(128, 192), seed=0, max_side=None):
    rng = np.random.RandomState(seed)
    h, w = img_hw
    x1 = rng.uniform(0, w - 2, n)
    y1 = rng.uniform(0, h - 2, n)
    ww = rng.uniform(1, (max_side or w) - 1, n)
    hh = rng.uniform(1, (max_side or h) - 1, n)
    boxes = np.stack([x1, y1, np.minimum(x1 + ww, w), np.minimum(y1 + hh, h)], 1)
    return boxes.astype(np.float32)


def test_level_indices_match_reference():
    rois = np.concatenate(
        [rand_rois(30, seed=1, max_side=60), rand_rois(30, (900, 1300), seed=2)]
    ).astype(np.float32)
    got = np.asarray(fpn_level_indices(jnp.asarray(rois)))
    np.testing.assert_array_equal(got, level_map_ref(rois))


@pytest.mark.parametrize("out,ratio", [(7, 2), (14, 2), (5, 1)])
def test_single_level_matches_reference(out, ratio):
    feats = make_pyramid(seed=3)
    # tiny rois so every roi maps to level 0 (scale 1/4)
    rois = rand_rois(9, img_hw=(120, 180), seed=4, max_side=40)
    got = np.asarray(
        multilevel_roi_align(
            [jnp.asarray(f) for f in feats],
            jnp.asarray(rois),
            output_size=out,
            sampling_ratio=ratio,
            roi_chunk=4,
        )
    )
    want = roi_align_ref(feats[0], rois, 0.25, out, ratio)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_multilevel_routing_matches_per_level_reference():
    feats = make_pyramid(seed=5, base=(64, 96))
    img_hw = (256, 384)
    rois = np.concatenate(
        [
            rand_rois(6, img_hw, seed=6, max_side=50),     # -> P2
            rand_rois(6, img_hw, seed=7, max_side=200),    # mixed
            np.array([[0, 0, 256, 256]], dtype=np.float32),  # large -> higher lvl
        ]
    )
    lvls = level_map_ref(rois)
    got = np.asarray(
        multilevel_roi_align(
            [jnp.asarray(f) for f in feats], jnp.asarray(rois), 7, 2, roi_chunk=8
        )
    )
    scales = [0.25, 0.125, 0.0625, 0.03125]
    for i, lvl in enumerate(lvls):
        want = roi_align_ref(feats[lvl], rois[i : i + 1], scales[lvl], 7, 2)[0]
        np.testing.assert_allclose(got[i], want, rtol=1e-4, atol=1e-4)


def test_out_of_bounds_rois_are_finite():
    feats = [jnp.asarray(f) for f in make_pyramid(seed=8)]
    rois = jnp.asarray(
        [[-50.0, -50.0, -10.0, -10.0], [0.0, 0.0, 0.0, 0.0], [1e4, 1e4, 2e4, 2e4]]
    )
    out = np.asarray(multilevel_roi_align(feats, rois, 7, 2, roi_chunk=4))
    assert np.isfinite(out).all()


def test_batched_wrapper_shape():
    feats = make_pyramid(seed=9)
    bfeats = [jnp.asarray(np.stack([f, f * 2])) for f in feats]
    rois = jnp.asarray(np.stack([rand_rois(5, seed=10), rand_rois(5, seed=11)]))
    out = batched_multilevel_roi_align(bfeats, rois, 7, roi_chunk=8)
    assert out.shape == (2, 5, 7, 7, 8)
