"""Resident-tile Pallas RoIAlign adjoint vs the exact XLA adjoint.

The kernel (ops/pallas_roi_adjoint.py) must reproduce
``multilevel_roi_align_adjoint`` — same bilinear summands, f32
accumulation order differs — for every roi whose clamped footprint spans
<= 2 ownership bands per axis (module docstring).  Interpret mode runs the
real kernel logic (DMAs, scalar prefetch, band duplication) on CPU.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from seam_match_rcnn_tpu.ops.pallas_roi_adjoint import (
    OWN, multilevel_roi_align_adjoint_pallas)
from seam_match_rcnn_tpu.ops.roi_align import multilevel_roi_align_adjoint

SHAPES = ((64, 96), (32, 48), (16, 24), (8, 12))  # canvas 256x384
C = 8


def exact_ref(g, rois, out):
    return jax.vmap(
        lambda gi, ri: multilevel_roi_align_adjoint(gi, SHAPES, ri, out)
    )(g.astype(jnp.float32), rois)


def run_kernel(g, rois, out):
    return multilevel_roi_align_adjoint_pallas(
        g, rois, SHAPES, out, interpret=True)


def check(g, rois, out, tol=2e-5):
    got = run_kernel(jnp.asarray(g), jnp.asarray(rois), out)
    want = exact_ref(jnp.asarray(g), jnp.asarray(rois), out)
    for lv, (a, b) in enumerate(zip(got, want)):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(1.0, np.abs(b).max())
        np.testing.assert_allclose(
            a, b, atol=tol * scale,
            err_msg=f"level {lv} diverges (out={out})")


def mix_rois(rng, b, n, canvas=(256, 384)):
    s = rng.uniform(8, 300, (b, n))
    ar = rng.choice([0.5, 1.0, 2.0], (b, n))
    w = s * np.sqrt(ar)
    h = s / np.sqrt(ar)
    x1 = rng.uniform(0, canvas[1] - np.minimum(w, canvas[1] - 1))
    y1 = rng.uniform(0, canvas[0] - np.minimum(h, canvas[0] - 1))
    return np.stack(
        [x1, y1, np.minimum(x1 + w, canvas[1]),
         np.minimum(y1 + h, canvas[0])], -1).astype(np.float32)


def test_anchor_mix_matches_exact_adjoint():
    rng = np.random.RandomState(0)
    b, n, out = 2, 24, 7
    rois = mix_rois(rng, b, n)
    g = rng.randn(b, n, out, out, C).astype(np.float32)
    check(g, rois, out)


def test_mask_geometry_14():
    rng = np.random.RandomState(1)
    b, n, out = 2, 10, 14
    rois = mix_rois(rng, b, n)
    g = rng.randn(b, n, out, out, C).astype(np.float32)
    check(g, rois, out)


def test_band_straddle_and_borders():
    """Rois whose footprints cross the 64-cell ownership boundary, sit at
    level borders, or collapse to degenerate size — the band-duplication
    and clamp cases the kernel must get exactly right."""
    rois = np.asarray([[
        [200.0, 220.0, 320.0, 300.0],   # P2 footprint crossing y-band 0/1
        [0.0, 0.0, 40.0, 40.0],         # top-left corner
        [340.0, 210.0, 383.0, 255.0],   # bottom-right corner
        [0.0, 0.0, 2.0, 2.0],           # tiny (clamped unit roi)
        [100.0, 100.0, 100.0, 100.0],   # degenerate zero-area
        [250.0, 60.0, 260.0, 256.0],    # tall sliver crossing bands
        [60.0, 120.0, 383.0, 160.0],    # wide sliver crossing x-bands
        [0.0, 250.0, 380.0, 256.0],     # bottom edge, wide
    ]], np.float32)
    rng = np.random.RandomState(2)
    g = rng.randn(1, rois.shape[1], 7, 7, C).astype(np.float32)
    check(g, rois, 7)


def test_zero_rois_and_empty_tiles_write_zeros():
    """Tiles untouched by any roi must come back exactly zero (the cover
    instances guarantee initialization), and zero cotangents produce zero
    grads everywhere."""
    rois = np.asarray([[[10.0, 10.0, 60.0, 60.0]]], np.float32)
    g = np.zeros((1, 1, 7, 7, C), np.float32)
    outs = run_kernel(jnp.asarray(g), jnp.asarray(rois), 7)
    for a in outs:
        np.testing.assert_array_equal(np.asarray(a), 0.0)


def test_outlier_footprint_finite_and_bounded():
    """Aspect ~8 outlier spanning >2 bands: tail samples drop (documented
    clamp — the resident forward's window never pooled them either); the
    result must stay finite and match the exact adjoint on the covered
    2x2-band neighborhood's total mass within the dropped-tail bound."""
    rois = np.asarray([[[0.0, 96.0, 383.0, 144.0]]], np.float32)  # 384x48
    rng = np.random.RandomState(3)
    g = rng.randn(1, 1, 7, 7, C).astype(np.float32)
    got = run_kernel(jnp.asarray(g), jnp.asarray(rois), 7)
    want = exact_ref(jnp.asarray(g), jnp.asarray(rois), 7)
    for a in got:
        assert np.isfinite(np.asarray(a)).all()
    # covered region identical: compare columns within the first two
    # x-bands of the roi's level (level 2 here: 16x24 cells)
    lv = 2
    a, b = np.asarray(got[lv]), np.asarray(want[lv])
    cov = min(2 * OWN, a.shape[2])
    np.testing.assert_allclose(a[:, :, :cov], b[:, :, :cov], atol=1e-4)


def test_batched_images_are_independent():
    rng = np.random.RandomState(4)
    out = 7
    rois1 = mix_rois(rng, 1, 12)
    rois2 = mix_rois(rng, 1, 12)
    g1 = rng.randn(1, 12, out, out, C).astype(np.float32)
    g2 = rng.randn(1, 12, out, out, C).astype(np.float32)
    both = run_kernel(
        jnp.asarray(np.concatenate([g1, g2])),
        jnp.asarray(np.concatenate([rois1, rois2])), out)
    solo1 = run_kernel(jnp.asarray(g1), jnp.asarray(rois1), out)
    solo2 = run_kernel(jnp.asarray(g2), jnp.asarray(rois2), out)
    for lv in range(4):
        np.testing.assert_allclose(
            np.asarray(both[lv][0]), np.asarray(solo1[lv][0]), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(both[lv][1]), np.asarray(solo2[lv][0]), atol=1e-5)


def test_fast_precision_bounded_drift():
    """highest=False (the production rule for bf16 features): bf16 MXU
    passes with f32 accumulation must stay within bf16 rounding of the
    exact adjoint — bounded, not bit-matching."""
    rng = np.random.RandomState(9)
    b, n, out = 1, 16, 7
    rois = mix_rois(rng, b, n)
    g = rng.randn(b, n, out, out, C).astype(np.float32)
    got = multilevel_roi_align_adjoint_pallas(
        jnp.asarray(g), jnp.asarray(rois), SHAPES, out, interpret=True,
        highest=False)
    want = exact_ref(jnp.asarray(g), jnp.asarray(rois), out)
    for lv, (a, bb) in enumerate(zip(got, want)):
        a, bb = np.asarray(a), np.asarray(bb)
        scale = max(1.0, np.abs(bb).max())
        # bf16 relative rounding ~ 2^-8 per summand; overlaps accumulate
        np.testing.assert_allclose(a, bb, atol=0.04 * scale,
                                   err_msg=f"level {lv}")
        # and it is NOT garbage: strong agreement in an L2 sense
        denom = float(np.linalg.norm(bb)) or 1.0
        assert float(np.linalg.norm(a - bb)) / denom < 0.02


def test_trainable_wrapper_grads_match_across_adjoints():
    """The custom_vjp wrappers produce (near-)identical feature gradients
    with adjoint='pallas' vs adjoint='xla' — the wiring contract of
    RoIHeadsConfig.roi_adjoint_backend.  Uses the resident forward in
    interpret mode on a small pyramid."""
    from seam_match_rcnn_tpu.ops import pallas_roi_align_resident as res

    rng = np.random.RandomState(7)
    b, n, out, c = 1, 12, 7, 128
    feats = tuple(
        jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
        for h, w in SHAPES)
    rois = jnp.asarray(mix_rois(rng, b, n))

    grads = {}
    for adj in ("xla", "pallas"):
        def loss(fs, adj=adj):
            pooled, _ = res.pallas_roi_align_resident_trainable(
                fs, rois, out, 2, 16, jnp.float32, adj)
            return jnp.sum(pooled * pooled)

        # off-TPU both the resident forward and the adjoint kernel resolve
        # interpret="auto" to interpret mode — same code path as the chip
        grads[adj] = jax.grad(loss)(feats)

    for lv, (a, bb) in enumerate(zip(grads["pallas"], grads["xla"])):
        a, bb = np.asarray(a), np.asarray(bb)
        scale = max(1.0, np.abs(bb).max())
        np.testing.assert_allclose(a, bb, atol=3e-5 * scale,
                                   err_msg=f"level {lv}")


@pytest.mark.tpu
def test_compiled_matches_exact_on_tpu():
    """Compiled kernel vs the exact adjoint at real channel width (C=256,
    128-aligned) on the chip (SEAM_TEST_TPU=1 pytest -m tpu)."""
    rng = np.random.RandomState(5)
    b, n, out, c = 2, 64, 7, 256
    rois = mix_rois(rng, b, n)
    g = rng.randn(b, n, out, out, c).astype(np.float32)
    got = multilevel_roi_align_adjoint_pallas(
        jnp.asarray(g), jnp.asarray(rois), SHAPES, out)
    want = jax.vmap(
        lambda gi, ri: multilevel_roi_align_adjoint(gi, SHAPES, ri, out)
    )(jnp.asarray(g), jnp.asarray(rois))
    for lv, (a, bb) in enumerate(zip(got, want)):
        a, bb = np.asarray(a), np.asarray(bb)
        scale = max(1.0, np.abs(bb).max())
        np.testing.assert_allclose(a, bb, atol=3e-5 * scale,
                                   err_msg=f"level {lv}")
