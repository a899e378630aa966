"""Tile-resident Pallas RoIAlign vs the exact XLA oracle (interpret mode).

Same window contract as the production patch-DMA kernel (agreement is exact
for in-contract footprints); the resident kernel additionally returns its
tile-sort permutation, tested round-trip here.  Compiled-on-TPU runs live in
test_tpu_compiled.py.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from seam_match_rcnn_tpu.ops.pallas_roi_align_resident import (
    pallas_roi_align_resident,
)
from seam_match_rcnn_tpu.ops.roi_align import batched_multilevel_roi_align

from test_pallas_roi_align import make_pyramid, moderate_rois


def _exact(feats, rois, out_size=7):
    return np.asarray(batched_multilevel_roi_align(
        [jnp.asarray(f, jnp.float32) for f in feats], jnp.asarray(rois),
        out_size, roi_chunk=min(64, rois.shape[1])))


def _unsort(pooled, order):
    out = np.empty_like(pooled)
    out[np.asarray(order)] = np.asarray(pooled)
    return out


def test_resident_matches_exact_f32():
    feats = [jnp.asarray(f)[None] for f in make_pyramid(seed=21)]
    rois = jnp.asarray(moderate_rois(48, seed=22))[None]
    pooled, order = pallas_roi_align_resident(feats, rois, 7, interpret=True)
    got = _unsort(pooled, order).reshape(1, 48, 7, 7, -1)
    np.testing.assert_allclose(got, _exact(feats, rois), rtol=1e-4, atol=1e-4)


def test_resident_multi_image_batch_and_order():
    b = 3
    feats = [jnp.asarray(np.stack([make_pyramid(seed=30 + i)[l]
                                   for i in range(b)]))
             for l in range(4)]
    rois = jnp.asarray(np.stack([moderate_rois(16, seed=40 + i)
                                 for i in range(b)]))
    pooled, order = pallas_roi_align_resident(feats, rois, 7, interpret=True)
    o = np.asarray(order)
    assert sorted(o.tolist()) == list(range(b * 16))  # true permutation
    # tile key leads with the image index ⇒ images stay contiguous in order
    assert (np.diff(o // 16) >= 0).all()
    got = _unsort(pooled, order).reshape(b, 16, 7, 7, -1)
    np.testing.assert_allclose(got, _exact(feats, rois), rtol=1e-4, atol=1e-4)


def test_resident_multiple_chunks_rank_rebase():
    """roi_chunk < N forces several pallas_calls; chunk-local rank rebasing
    and the per-chunk rank→tile tables must hold at every boundary."""
    feats = [jnp.asarray(f)[None] for f in make_pyramid(seed=51, base=(80, 120))]
    rois = jnp.asarray(
        moderate_rois(96, img_hw=(320, 480), seed=52, max_aspect=1.6))[None]
    pooled, order = pallas_roi_align_resident(
        feats, rois, 7, interpret=True, roi_chunk=32)
    got = _unsort(pooled, order).reshape(1, 96, 7, 7, -1)
    np.testing.assert_allclose(got, _exact(feats, rois), rtol=1e-4, atol=1e-4)


def test_resident_border_and_tiny_boxes():
    feats = [jnp.asarray(f)[None] for f in make_pyramid(seed=53)]
    rois = jnp.asarray([[
        [0.0, 0.0, 30.0, 40.0],
        [350.0, 220.0, 384.0, 256.0],
        [0.0, 0.0, 384.0, 256.0],
        [5.0, 5.0, 6.0, 6.0],
        [0.0, 0.0, 1.0, 1.0],
        [380.0, 250.0, 384.0, 256.0],
        [100.0, 30.0, 180.0, 90.0],
        [40.0, 200.0, 90.0, 250.0],
    ]])
    pooled, order = pallas_roi_align_resident(
        feats, rois, 7, interpret=True, roi_chunk=8)
    got = _unsort(pooled, order).reshape(1, 8, 7, 7, -1)
    np.testing.assert_allclose(got, _exact(feats, rois), rtol=1e-4, atol=1e-4)


def test_resident_bf16_close_and_out_dtype():
    feats32 = [jnp.asarray(f)[None] for f in make_pyramid(seed=61)]
    feats = [f.astype(jnp.bfloat16) for f in feats32]
    rois = jnp.asarray(moderate_rois(32, seed=62))[None]
    pooled, order = pallas_roi_align_resident(
        feats, rois, 7, interpret=True, out_dtype=jnp.bfloat16)
    assert pooled.dtype == jnp.bfloat16
    got = _unsort(np.asarray(pooled, np.float32), order).reshape(1, 32, 7, 7, -1)
    # bf16 inputs + one bf16 rounding of the row-pooled intermediate
    np.testing.assert_allclose(got, _exact(feats32, rois), rtol=0, atol=2e-2)


def test_resident_mask_output_size():
    feats = [jnp.asarray(f)[None] for f in make_pyramid(seed=63)]
    rois = jnp.asarray(moderate_rois(16, seed=64))[None]
    pooled, order = pallas_roi_align_resident(feats, rois, 14, interpret=True)
    got = _unsort(pooled, order).reshape(1, 16, 14, 14, -1)
    np.testing.assert_allclose(got, _exact(feats, rois, 14), rtol=1e-4,
                               atol=1e-4)


def test_resident_jit_grad_free_and_static():
    """The wrapper is jittable at fixed shapes (it is already jitted; this
    pins that tracing twice at the same shapes reuses the cache)."""
    feats = [jnp.asarray(f)[None] for f in make_pyramid(seed=65)]
    rois = jnp.asarray(moderate_rois(8, seed=66))[None]
    f = lambda rs: pallas_roi_align_resident(feats, rs, 7, interpret=True)[0]
    a = f(rois)
    b = f(rois + 0.0)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert a.shape == (8, 7, 7, feats[0].shape[-1])


def run_structure_rois(pattern, seed=0):
    """Deterministic rois with a prescribed TILE-RUN structure (for the
    fast/slow-path kernel layout: switch machinery runs only in groups whose
    rank changes).  Tile anchors are chosen to land in the SAME distinct
    tiles under both the f32 (48-col) and bf16 (72-col) tile strides.

    pattern: list of (anchor_index, run_len) — emitted consecutively, so
    sorted order preserves the prescribed runs (stable sort on equal keys).
    Anchors: 4 level-0 tiles [(ty,tx) in {0,1}x{0,1}] + 1 level-1 tile.
    """
    rng = np.random.RandomState(seed)
    # (x0_px, y0_px, side_px): level-0 boxes ~40 px, level-1 ~150 px
    anchors = [
        (16.0, 16.0, 40.0), (300.0, 16.0, 40.0),
        (16.0, 148.0, 40.0), (300.0, 148.0, 40.0),
        (30.0, 40.0, 150.0),
    ]
    rois = []
    for ai, run in pattern:
        x0, y0, side = anchors[ai]
        for _ in range(run):
            # jitter inside the tile: < 1 cell of the box level
            cell = 4.0 if side < 100 else 8.0
            dx, dy = rng.uniform(0, cell * 0.9, 2)
            ds = rng.uniform(-2.0, 2.0)
            rois.append([x0 + dx, y0 + dy,
                         x0 + dx + side + ds, y0 + dy + side + ds])
    return np.asarray(rois, np.float32)


def test_resident_run_structure_patterns():
    """Adversarial tile-run layouts for the fast/slow kernel structure:
    (a) runs of exactly MINI=8 — every switch lands at k==0 of a group;
    (b) singleton runs — many switches inside one group;
    (c) one long run — pure fast path after group 0;
    (d) ragged runs straddling group boundaries."""
    feats = [jnp.asarray(f)[None] for f in make_pyramid(seed=81)]
    patterns = {
        "aligned": [(0, 8), (1, 8), (4, 8)],
        "singletons": [(0, 1), (1, 1), (2, 1), (3, 1), (4, 1), (0, 2), (1, 1)],
        "one_run": [(3, 24)],
        "ragged": [(0, 3), (1, 5), (2, 11), (4, 5)],
    }
    for name, pat in patterns.items():
        rois_np = run_structure_rois(pat, seed=82)
        n = len(rois_np)
        rois = jnp.asarray(rois_np)[None]
        # roi_chunk=24 ⇒ 3 groups per kernel launch: groups past the first
        # take the FAST path whenever their rank doesn't change
        pooled, order = pallas_roi_align_resident(
            feats, rois, 7, interpret=True, roi_chunk=24)
        got = _unsort(np.asarray(pooled), order).reshape(1, n, 7, 7, -1)
        np.testing.assert_allclose(
            got, _exact(feats, rois), rtol=1e-4, atol=1e-4,
            err_msg=f"pattern {name}")


def test_resident_clamping_rois_match_production_kernel():
    """Out-of-contract footprints must clamp at the SAME patch edge as the
    production kernel (dynamic clamp_last = dy + PATCH - 1), so the clamp
    mask and exact-fixup escape hatch transfer unchanged."""
    from seam_match_rcnn_tpu.ops.pallas_roi_align import (
        footprint_clamp_mask, pallas_roi_align_batched)

    from test_pallas_roi_align import extreme_rois

    feats = [jnp.asarray(f)[None] for f in make_pyramid(seed=71)]
    # band-top high-aspect boxes -> footprints past the 40x48 window
    rois_np = np.concatenate(
        [extreme_rois(24, seed=72), moderate_rois(8, seed=73, max_aspect=1.4)])
    rois = jnp.asarray(rois_np)[None]
    level_shapes = tuple((f.shape[1], f.shape[2]) for f in feats)
    mask = np.asarray(footprint_clamp_mask(rois.reshape(-1, 4), level_shapes))
    assert mask.any(), "fixture must exercise the clamped path"

    prod = np.asarray(pallas_roi_align_batched(
        feats, rois, 7, interpret=True, roi_chunk=32))
    pooled, order = pallas_roi_align_resident(
        feats, rois, 7, interpret=True, roi_chunk=32)
    got = _unsort(np.asarray(pooled), order).reshape(prod.shape)
    np.testing.assert_allclose(got, prod, rtol=1e-4, atol=1e-4)


def test_resident_trainable_grads_match_exact():
    """pallas_roi_align_resident_trainable (VERDICT r2 #7): forward equals
    the resident kernel (sorted output + order) and its custom backward is
    the EXACT adjoint — feature grads equal the exact XLA path's, routed
    back through the tile-sort permutation."""
    import jax

    from seam_match_rcnn_tpu.ops.pallas_roi_align_resident import (
        pallas_roi_align_resident_trainable)
    from seam_match_rcnn_tpu.ops.roi_align import batched_multilevel_roi_align

    feats = tuple(jnp.asarray(f, jnp.float32)[None] for f in make_pyramid(seed=77))
    rois = jnp.asarray(moderate_rois(12, seed=78))[None]

    def loss_res(fs):
        pooled, order = pallas_roi_align_resident_trainable(
            fs, rois, 7, 2, 16, jnp.float32)
        # weight each SORTED row by a function of its ORIGINAL index so the
        # loss is permutation-independent of the tile sort
        w = jnp.sin(order.astype(jnp.float32) + 1.0)[:, None, None, None]
        return jnp.sum(jnp.cos(pooled) * w)

    def loss_exact(fs):
        out = batched_multilevel_roi_align(
            list(fs), rois, 7, sampling_ratio=2).astype(jnp.float32)
        out = out.reshape((-1,) + out.shape[2:])
        w = jnp.sin(jnp.arange(out.shape[0], dtype=jnp.float32) + 1.0)
        return jnp.sum(jnp.cos(out) * w[:, None, None, None])

    lr, gr = jax.value_and_grad(loss_res)(feats)
    lx, gx = jax.value_and_grad(loss_exact)(feats)
    np.testing.assert_allclose(float(lr), float(lx), rtol=1e-4)
    for a, b in zip(gr, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_resident_matmul_gate_fine_pieces():
    """Footprint-gated pooling matmuls (per-group max piece class): exact at
    an aggressively fine piece grid, which maximizes class mixing inside
    MINI groups and exercises every (row, col) branch body.  Gating is
    bit-neutral by the zero-tail invariant (wy/wx columns at or past the
    footprint bound are exactly zero), so the oracle comparison is the same
    as the ungated kernel's."""
    feats = [jnp.asarray(f)[None] for f in make_pyramid(seed=91)]
    rois = jnp.asarray(moderate_rois(64, seed=92))[None]
    ref = _exact(feats, rois)
    for rp, cp in (((8, 16, 24, 32, 40, 48), (8, 16, 24, 32, 40, 48)),
                   ((24, 48), (48,)),
                   ((48,), (24, 48))):
        pooled, order = pallas_roi_align_resident(
            feats, rois, 7, interpret=True, roi_chunk=32,
            row_pieces=rp, col_pieces=cp)
        got = _unsort(pooled, order).reshape(1, 64, 7, 7, -1)
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4,
                                   err_msg=f"pieces {rp}/{cp}")


def test_resident_zero_copy_levels():
    """Zero-copy pyramid layout: a level whose raw array already satisfies
    the tile-DMA constraints (h % 8 == 0, h >= 72, w >= tile cols,
    c % 128 == 0) skips the jnp.pad copy — tile starts clamp into bounds
    and the per-roi window origin + geometry shift absorb the clamp.  The
    fixture's level 0 (96×144) takes the zero-copy path while levels 1-3
    pad; rois are pushed to every border (incl. x1=0 → the -1 lead sample
    position, and bottom/right edges where both the window AND tile origins
    clamp) and compared against the exact oracle."""
    rng = np.random.RandomState(5)
    shapes = [(96, 144), (48, 72), (24, 36), (12, 18)]
    feats = [jnp.asarray(rng.randn(2, h, w, 128).astype(np.float32))
             for h, w in shapes]
    scales = (0.25, 0.125, 0.0625, 0.03125)
    h_img, w_img = 384, 576  # level0 * 4

    # corner/edge/interior mix across all levels (area picks the level)
    s = np.exp(rng.uniform(np.log(12.0), np.log(300.0), 120))
    a = np.exp(rng.randn(120) * 0.3)
    cy = rng.choice([0.0, 1.0, 383.0, 384.0], 120) + rng.randn(120) * 3
    cx = rng.choice([0.0, 1.0, 575.0, 576.0], 120) + rng.randn(120) * 3
    interior = rng.rand(120) < 0.5
    cy = np.where(interior, rng.uniform(0, 384, 120), cy)
    cx = np.where(interior, rng.uniform(0, 576, 120), cx)
    x1 = np.clip(cx - s / np.sqrt(a) / 2, 0, w_img - 1)
    y1 = np.clip(cy - s * np.sqrt(a) / 2, 0, h_img - 1)
    x2 = np.clip(cx + s / np.sqrt(a) / 2, x1 + 1, w_img)
    y2 = np.clip(cy + s * np.sqrt(a) / 2, y1 + 1, h_img)
    rois = jnp.asarray(
        np.stack([x1, y1, x2, y2], 1).reshape(2, 60, 4).astype(np.float32))

    want = np.asarray(batched_multilevel_roi_align(
        [jnp.asarray(f) for f in feats], rois, 7, spatial_scales=scales,
        roi_chunk=60))
    pooled, order = pallas_roi_align_resident(
        feats, rois, 7, 2, scales, interpret=True, roi_chunk=64)
    got = _unsort(pooled, order).reshape(2, 60, 7, 7, -1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    # bf16 wide-tile variant (tile_w 120 ≥ 144? no — 144 ≥ 120 ✓ zero-copy)
    featsb = [f.astype(jnp.bfloat16) for f in feats]
    pooled, order = pallas_roi_align_resident(
        featsb, rois, 7, 2, scales, interpret=True, roi_chunk=64,
        out_dtype=jnp.float32)
    got = _unsort(pooled, order).reshape(2, 60, 7, 7, -1)
    np.testing.assert_allclose(got, want, rtol=0.03, atol=0.03)
