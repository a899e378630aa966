"""Pallas RoIAlign vs the exact XLA implementation (interpret mode).

Agreement is exact (up to float assoc.) whenever a roi's footprint at its
FPN level fits the start-aligned 40x48 window (footprint budget ~39.5
cells — aspect < 2.0 at the very top of the level-mapper band, < 2.7
mid-band; measured in PERF.md "patch-clamp quantification");
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
    assert (serving_model_config().roi_heads.roi_align_backend
            == "pallas_resident")
    assert (fast_eval_model_config().roi_heads.roi_align_backend
            == "pallas_resident")
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


def extreme_rois(n, img_hw=(256, 384), seed=0):
    """Boxes spanning aspect ratios 1..4 at the top of each level band —
    guarantees a mix of in-window and patch-clamped footprints."""
    rng = np.random.RandomState(seed)
    h, w = img_hw
    rois = []
    for _ in range(n):
        side = rng.uniform(40, 220)
        a = rng.uniform(1.0, 4.0)
        if rng.rand() < 0.5:
            bw, bh = side * np.sqrt(a), side / np.sqrt(a)
        else:
            bw, bh = side / np.sqrt(a), side * np.sqrt(a)
        x1 = rng.uniform(0, max(w - bw, 1))
        y1 = rng.uniform(0, max(h - bh, 1))
        rois.append([x1, y1, min(x1 + bw, w - 1), min(y1 + bh, h - 1)])
    return np.asarray(rois, np.float32)


def test_footprint_clamp_mask_predicts_divergence():
    """footprint_clamp_mask must flag EXACTLY the rois where the Pallas
    kernel diverges from the exact path (VERDICT r1 weak #2: quantify the
    approximation).  Unflagged rois must agree to float tolerance; flagged
    rois must actually diverge (the mask is tight, not conservative)."""
    from seam_match_rcnn_tpu.ops.pallas_roi_align import footprint_clamp_mask

    feats = [jnp.asarray(f) for f in make_pyramid(seed=51)]
    level_shapes = tuple((f.shape[0], f.shape[1]) for f in feats)
    rois = jnp.asarray(np.concatenate(
        [moderate_rois(24, seed=52, max_aspect=1.5), extreme_rois(40, seed=53)]))
    mask = np.asarray(footprint_clamp_mask(rois, level_shapes, output_size=7))
    want = np.asarray(multilevel_roi_align(feats, rois, 7, 2, roi_chunk=8))
    got = np.asarray(pallas_multilevel_roi_align(feats, rois, 7, 2, interpret=True))
    err = np.abs(got - want).max(axis=(1, 2, 3))
    assert mask.any() and not mask.all(), "fixture must mix both classes"
    # unflagged -> exact
    np.testing.assert_array_less(err[~mask], 1e-4)
    # flagged -> genuinely diverges (allowing boundary-grazing cases where
    # the clamped sample lands on near-identical values)
    assert (err[mask] > 1e-4).mean() > 0.8, (err[mask], mask.sum())


def test_apply_exact_fixup_restores_exactness():
    from seam_match_rcnn_tpu.ops.pallas_roi_align import apply_exact_fixup

    feats = [jnp.asarray(f) for f in make_pyramid(seed=61)]
    rois = jnp.asarray(np.concatenate(
        [moderate_rois(16, seed=62, max_aspect=1.5), extreme_rois(16, seed=63)]))
    want = np.asarray(multilevel_roi_align(feats, rois, 7, 2, roi_chunk=8))
    got = pallas_multilevel_roi_align(feats, rois, 7, 2, interpret=True)
    fixed = np.asarray(apply_exact_fixup(
        [f[None] for f in feats], rois[None], got[None], 7, 2, budget=32))[0]
    np.testing.assert_allclose(fixed, want, rtol=1e-4, atol=1e-4)
    # budget 0 is a no-op
    same = apply_exact_fixup(
        [f[None] for f in feats], rois[None], got[None], 7, 2, budget=0)
    np.testing.assert_array_equal(np.asarray(same)[0], np.asarray(got))


def test_fixup_budget_smaller_than_clamped_count():
    """With budget < clamped rois, the top-budget flagged rois become exact
    and the rest keep the pallas output (no corruption of unflagged rows)."""
    from seam_match_rcnn_tpu.ops.pallas_roi_align import (
        apply_exact_fixup, footprint_clamp_mask)

    feats = [jnp.asarray(f) for f in make_pyramid(seed=71)]
    level_shapes = tuple((f.shape[0], f.shape[1]) for f in feats)
    # band-top (sqrt-area ~27 cells at P2) aspect-3 boxes: tall footprint
    # ~46 cells > the 40-row patch -> guaranteed clamped; plus moderate rois
    tall = [[x, 4.0, x + 62.0, 4.0 + 187.0] for x in (8.0, 90.0, 170.0, 250.0)]
    rois = jnp.asarray(np.concatenate(
        [np.asarray(tall, np.float32), moderate_rois(20, seed=72, max_aspect=1.4)]))
    mask = np.asarray(footprint_clamp_mask(rois, level_shapes, output_size=7))
    n_clamped = int(mask.sum())
    assert n_clamped >= 3
    budget = 2
    got = pallas_multilevel_roi_align(feats, rois, 7, 2, interpret=True)
    fixed = np.asarray(apply_exact_fixup(
        [f[None] for f in feats], rois[None], got[None], 7, 2, budget=budget))[0]
    want = np.asarray(multilevel_roi_align(feats, rois, 7, 2, roi_chunk=8))
    exact_rows = (np.abs(fixed - want).max(axis=(1, 2, 3)) < 1e-4)
    # unflagged rows still exact, at least `budget` flagged rows fixed
    assert exact_rows[~mask].all()
    assert exact_rows[mask].sum() >= budget
    # untouched rows keep the pallas output bit-for-bit
    unchanged = np.abs(fixed - np.asarray(got)).max(axis=(1, 2, 3)) == 0
    assert (unchanged | exact_rows).all()


def test_clamped_descriptor_drift_bounded_and_fixup_exact():
    """End-to-end-style quantification of the patch-clamp approximation
    (VERDICT r1 #2): pooled 14x14 features -> match-head descriptors ->
    pairwise retrieval scores, exact vs pallas vs pallas+fixup.

    Asserts the regression bounds recorded in PERF.md: unclamped rois carry
    zero descriptor drift; clamped-roi drift is bounded; the exact-fixup
    escape hatch removes it entirely."""
    import jax

    from seam_match_rcnn_tpu.models.match_head import MatchPredictor
    from seam_match_rcnn_tpu.ops.pallas_roi_align import (
        apply_exact_fixup, footprint_clamp_mask)

    feats = [jnp.asarray(f) for f in make_pyramid(seed=81, c=16)]
    level_shapes = tuple((f.shape[0], f.shape[1]) for f in feats)
    # 10 moderate + 6 band-top aspect-2.2 (clamped) boxes
    tall = [[x, 4.0, x + 70.0, 4.0 + 155.0]
            for x in (8.0, 60.0, 120.0, 180.0, 240.0, 300.0)]
    rois = jnp.asarray(np.concatenate(
        [moderate_rois(10, seed=82, max_aspect=1.4),
         np.asarray(tall, np.float32)]))
    mask = np.asarray(footprint_clamp_mask(rois, level_shapes, output_size=14))
    assert mask.sum() >= 4 and (~mask).sum() >= 8

    exact = multilevel_roi_align(feats, rois, 14, 2, roi_chunk=8)
    pallas = pallas_multilevel_roi_align(feats, rois, 14, 2, interpret=True)
    fixed = apply_exact_fixup(
        [f[None] for f in feats], rois[None], pallas[None], 14, 2, budget=8)[0]

    mp = MatchPredictor()

    def _init(mdl, x):
        d = mdl.descriptors(x)
        return mdl.score_pairs(d, d[:1])

    variables = mp.init(jax.random.PRNGKey(0), jnp.zeros((2, 14, 14, 16)),
                        method=_init)

    def desc(x):
        return np.asarray(mp.apply(variables, x.astype(jnp.float32),
                                   method=MatchPredictor.descriptors))

    d_exact, d_pallas, d_fixed = desc(exact), desc(pallas), desc(fixed)
    drift = np.abs(d_pallas - d_exact).max(axis=1)
    drift_fixed = np.abs(d_fixed - d_exact).max(axis=1)
    # unclamped rois: identical through the trunk (float assoc. only)
    assert drift[~mask].max() < 1e-4, drift[~mask]
    # clamped rois measurably drift without the fixup...
    assert drift[mask].max() > 1e-4
    # ...but the clamp only perturbs the last pooled rows and the trunk
    # averages it out: ≲1e-3 on O(1) descriptors for band-top aspect-2.2
    # boxes (measured ~2e-4; PERF.md "patch-clamp quantification")
    assert drift[mask].max() < 5e-3, drift[mask]
    # fixup restores exactness everywhere
    assert drift_fixed.max() < 1e-4, drift_fixed

    # retrieval-score view: street x shop pair scores; rank flips can only
    # come from clamped rows, and the fixup removes them all
    shop = d_exact[:4]

    def ranks(d):
        s = mp.apply(variables, jnp.asarray(d), jnp.asarray(shop),
                     method=MatchPredictor.score_pairs)
        return np.argsort(-np.asarray(s)[..., 1], axis=1)

    r_exact, r_pallas, r_fixed = ranks(d_exact), ranks(d_pallas), ranks(d_fixed)
    flips = (r_pallas != r_exact).any(axis=1)
    assert not flips[~mask].any()
    assert (r_fixed == r_exact).all()


def test_pallas_roi_align_out_dtype_bf16_bit_identical():
    """out_dtype=bf16 must equal the f32 output rounded at the store — the
    serving box branch consumes bf16 anyway, so the kernel-side rounding
    saves a full-size cast op with zero value change (PERF.md round-2)."""
    from seam_match_rcnn_tpu.ops.pallas_roi_align import (
        pallas_roi_align_batched, pallas_roi_align_trainable)

    feats = [jnp.asarray(f, jnp.bfloat16) for f in make_pyramid(seed=31)]
    rois = jnp.asarray(moderate_rois(24, seed=32))
    f32 = pallas_roi_align_batched([f[None] for f in feats], rois[None], 7,
                                   roi_chunk=32)
    bf16 = pallas_roi_align_batched([f[None] for f in feats], rois[None], 7,
                                    roi_chunk=32, out_dtype=jnp.bfloat16)
    assert bf16.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(f32.astype(jnp.bfloat16), np.float32),
        np.asarray(bf16, np.float32))

    # differentiable wrapper: same forward, bf16 grads flow to the adjoint
    t = pallas_roi_align_trainable(
        tuple(f[None] for f in feats), rois[None], 7, 2, jnp.dtype(jnp.bfloat16))
    np.testing.assert_array_equal(np.asarray(t, np.float32),
                                  np.asarray(bf16, np.float32))
    import jax
    g = jax.grad(
        lambda fs: jnp.sum(pallas_roi_align_trainable(
            fs, rois[None], 7, 2, jnp.dtype(jnp.bfloat16)).astype(jnp.float32))
    )(tuple(f[None] for f in feats))
    assert all(gi.dtype == jnp.bfloat16 for gi in g)
