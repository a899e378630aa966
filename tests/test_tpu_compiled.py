"""Compiled-on-TPU kernel regression tests (`pytest -m tpu`).

CI on CPU exercises the Pallas kernels in interpret mode only, where
scratch buffers start zeroed — a stale-tail regression in the conditional
DMA could hide (ADVICE r1).  These tests run the kernels COMPILED on the
real chip against the exact XLA oracles.  Run with:

    SEAM_TEST_TPU=1 python -m pytest tests -m tpu -q

(SEAM_TEST_TPU=1 stops conftest from forcing the CPU backend.)
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.test_pallas_roi_align import make_pyramid, moderate_rois

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(jax.default_backend() != "tpu",
                       reason="requires a real TPU backend"),
]


@pytest.fixture(scope="module", autouse=True)
def _compile_cache():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache_tpu")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def test_tpu_pallas_roi_align_matches_exact_f32():
    from seam_match_rcnn_tpu.ops.pallas_roi_align import (
        pallas_multilevel_roi_align)
    from seam_match_rcnn_tpu.ops.roi_align import multilevel_roi_align

    feats = [jnp.asarray(f) for f in make_pyramid(seed=1, c=128)]
    rois = jnp.asarray(moderate_rois(64, seed=2))
    want = np.asarray(multilevel_roi_align(feats, rois, 7, 2, roi_chunk=32))
    got = np.asarray(pallas_multilevel_roi_align(
        feats, rois, 7, 2, interpret=False))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_tpu_pallas_tail_dma_stale_scratch():
    """The footprint-gated tail DMA leaves scratch rows stale when a roi
    skips them; the zero interp weights must cancel them EXACTLY in the
    compiled kernel (interpret mode zero-fills scratch and cannot catch
    this).  Mix: big-footprint rois (fill the tail with garbage) followed
    by small rois in the same mini-group/grid that skip the tail."""
    from seam_match_rcnn_tpu.ops.pallas_roi_align import (
        pallas_multilevel_roi_align)
    from seam_match_rcnn_tpu.ops.roi_align import multilevel_roi_align

    feats = [jnp.asarray(f) for f in make_pyramid(seed=3, c=128)]
    rng = np.random.RandomState(4)
    rois = []
    for i in range(96):
        if i % 4 == 0:
            # near-band-top square: tall footprint -> tail transferred
            s = rng.uniform(100, 110)
            x1 = rng.uniform(0, 384 - s)
            y1 = rng.uniform(0, 256 - s)
            rois.append([x1, y1, x1 + s, y1 + s])
        else:
            # small roi: tail skipped, scratch rows stale from prior program
            s = rng.uniform(16, 40)
            x1 = rng.uniform(0, 384 - s)
            y1 = rng.uniform(0, 256 - s)
            rois.append([x1, y1, x1 + s, y1 + s])
    rois = jnp.asarray(np.asarray(rois, np.float32))
    want = np.asarray(multilevel_roi_align(feats, rois, 7, 2, roi_chunk=32))
    got = np.asarray(pallas_multilevel_roi_align(
        feats, rois, 7, 2, interpret=False))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_tpu_pallas_roi_align_bf16_and_mask_size():
    from seam_match_rcnn_tpu.ops.pallas_roi_align import (
        pallas_multilevel_roi_align)
    from seam_match_rcnn_tpu.ops.roi_align import multilevel_roi_align

    feats = [jnp.asarray(f, jnp.bfloat16) for f in make_pyramid(seed=5, c=128)]
    rois = jnp.asarray(moderate_rois(32, seed=6))
    want = np.asarray(
        multilevel_roi_align(feats, rois, 14, 2, roi_chunk=16)).astype(np.float32)
    got = np.asarray(pallas_multilevel_roi_align(
        feats, rois, 14, 2, interpret=False))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_tpu_pallas_int8_compiled():
    from seam_match_rcnn_tpu.ops.pallas_roi_align import (
        pallas_multilevel_roi_align, quantize_features_int8)
    from seam_match_rcnn_tpu.ops.roi_align import multilevel_roi_align

    feats = [jnp.asarray(f) for f in make_pyramid(seed=7, c=128)]
    rois = jnp.asarray(moderate_rois(32, seed=8))
    want = np.asarray(multilevel_roi_align(feats, rois, 7, 2, roi_chunk=16))
    qs, scales = quantize_features_int8(feats)
    got = np.asarray(pallas_multilevel_roi_align(
        qs, rois, 7, 2, interpret=False, scales=scales))
    tol = np.abs(np.asarray(scales)).max() * 2.5 + 1e-6
    np.testing.assert_allclose(got, want, atol=tol)


def test_tpu_nlb_aggregate_compiled():
    """Fused NLB+attention-pooling kernel COMPILED on the chip vs the XLA
    aggregate (same pattern as tests/test_nlb_backend.py, which only runs
    interpret mode on CPU)."""
    from seam_match_rcnn_tpu.models.match_head import TemporalAggregator

    rng = np.random.RandomState(9)
    roi = jnp.asarray(rng.randn(2, 14, 14, 256).astype(np.float32))
    mod_x = TemporalAggregator(nlb_backend="xla")
    variables = mod_x.init(
        jax.random.PRNGKey(0), roi, jnp.zeros((1, 2), jnp.int32),
        jnp.ones((1, 2), bool), jnp.asarray([1]),
    )
    params = dict(variables["params"])
    params["nlb"] = dict(params["nlb"])
    params["nlb"]["w_z"] = {
        "kernel": jnp.asarray(rng.randn(128, 256).astype(np.float32) * 0.05),
        "bias": jnp.asarray(rng.randn(256).astype(np.float32) * 0.05),
    }
    variables = {"params": params, "batch_stats": variables["batch_stats"]}

    seqs = jnp.asarray(rng.randn(8, 6, 256).astype(np.float32))
    mask = jnp.asarray(rng.rand(8, 6) > 0.3).at[:, 0].set(True)
    seqs = seqs * mask[..., None]
    # f32-exact oracle on the CPU backend: the XLA TPU path would itself
    # truncate its matmuls to bf16, which is exactly the error class this
    # test guards the kernel against.
    with jax.default_device(jax.devices("cpu")[0]):
        want = np.asarray(mod_x.apply(variables, seqs, mask,
                                      method=TemporalAggregator.aggregate))
    mod_p = TemporalAggregator(nlb_backend="pallas")  # compiled, not interpret
    got = mod_p.apply(variables, seqs, mask,
                      method=TemporalAggregator.aggregate)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_tpu_exact_fixup_compiled():
    from seam_match_rcnn_tpu.ops.pallas_roi_align import (
        apply_exact_fixup, pallas_multilevel_roi_align)
    from seam_match_rcnn_tpu.ops.roi_align import multilevel_roi_align

    feats = [jnp.asarray(f) for f in make_pyramid(seed=10, c=128)]
    tall = [[x, 4.0, x + 62.0, 4.0 + 187.0] for x in (8.0, 120.0, 250.0)]
    rois = jnp.asarray(np.concatenate(
        [np.asarray(tall, np.float32),
         moderate_rois(13, seed=11, max_aspect=1.4)]))
    want = np.asarray(multilevel_roi_align(feats, rois, 7, 2, roi_chunk=8))
    got = pallas_multilevel_roi_align(feats, rois, 7, 2, interpret=False)
    fixed = np.asarray(apply_exact_fixup(
        [f[None] for f in feats], rois[None], got[None], 7, 2, budget=8))[0]
    np.testing.assert_allclose(fixed, want, rtol=1e-4, atol=1e-4)


def test_tpu_pairwise_scores_compiled():
    """Gallery-scoring Pallas kernel compiled on the chip vs the XLA matmul
    expansion (eval/gallery uses it for galleries >= 128 rows on TPU)."""
    from seam_match_rcnn_tpu.ops.pairwise import pairwise_match_scores
    from seam_match_rcnn_tpu.ops.pallas_kernels import pairwise_scores

    rng = np.random.RandomState(12)
    x = jnp.asarray(rng.randn(300, 256).astype(np.float32))
    y = jnp.asarray(rng.randn(200, 256).astype(np.float32))
    w = jnp.asarray(rng.randn(2, 256).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.randn(2).astype(np.float32) * 0.05)
    with jax.default_device(jax.devices("cpu")[0]):
        want = np.asarray(pairwise_match_scores(x, y, w, b))
    got = np.asarray(pairwise_scores(x, y, w, b, interpret=False))
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)


def test_tpu_resident_roi_align_f32_c256():
    """Compiled tile-resident kernel vs exact oracle — f32 at C=256
    exercises the narrow-tile VMEM path (two [72, 120·256] f32 tiles OOM the
    16 MB scoped-VMEM limit; regression for the dtype-dependent tile width)."""
    from seam_match_rcnn_tpu.ops.pallas_roi_align_resident import (
        pallas_roi_align_resident)
    from seam_match_rcnn_tpu.ops.roi_align import batched_multilevel_roi_align

    feats = [jnp.asarray(f)[None] for f in make_pyramid(seed=31, c=256)]
    rois = jnp.asarray(moderate_rois(64, seed=32))[None]
    pooled, order = pallas_roi_align_resident(
        feats, rois, 7, interpret=False, roi_chunk=64)
    got = np.empty_like(np.asarray(pooled))
    got[np.asarray(order)] = np.asarray(pooled)
    want = np.asarray(batched_multilevel_roi_align(
        feats, rois, 7, roi_chunk=32)).reshape(64, 7, 7, -1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_tpu_resident_run_structure_patterns():
    """Compiled fast/slow-path structure check: prescribed tile-run layouts
    (group-aligned runs, singleton runs, one long run, ragged runs).  A
    missed wait() in the hoisted switch machinery reads an in-flight or
    stale buffer — invisible in interpret mode (zeroed scratch, synchronous
    copies), caught compiled."""
    from seam_match_rcnn_tpu.ops.pallas_roi_align_resident import (
        pallas_roi_align_resident)
    from seam_match_rcnn_tpu.ops.roi_align import batched_multilevel_roi_align
    from tests.test_pallas_roi_align_resident import run_structure_rois

    feats = [jnp.asarray(f)[None] for f in make_pyramid(seed=41, c=256)]
    patterns = {
        "aligned": [(0, 8), (1, 8), (4, 8)],
        "singletons": [(0, 1), (1, 1), (2, 1), (3, 1), (4, 1), (0, 2), (1, 1)],
        "one_run": [(3, 24)],
        "ragged": [(0, 3), (1, 5), (2, 11), (4, 5)],
    }
    for name, pat in patterns.items():
        rois_np = run_structure_rois(pat, seed=42)
        n = len(rois_np)
        rois = jnp.asarray(rois_np)[None]
        pooled, order = pallas_roi_align_resident(
            feats, rois, 7, interpret=False, roi_chunk=24)
        got = np.empty_like(np.asarray(pooled))
        got[np.asarray(order)] = np.asarray(pooled)
        want = np.asarray(batched_multilevel_roi_align(
            feats, rois, 7, roi_chunk=24)).reshape(n, 7, 7, -1)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4,
                                   err_msg=f"pattern {name}")


def test_tpu_resident_roi_align_bf16():
    from seam_match_rcnn_tpu.ops.pallas_roi_align_resident import (
        pallas_roi_align_resident)
    from seam_match_rcnn_tpu.ops.roi_align import batched_multilevel_roi_align

    feats32 = [jnp.asarray(f)[None] for f in make_pyramid(seed=33, c=256)]
    feats = [f.astype(jnp.bfloat16) for f in feats32]
    rois = jnp.asarray(moderate_rois(64, seed=34))[None]
    pooled, order = pallas_roi_align_resident(
        feats, rois, 7, interpret=False, roi_chunk=64)
    got = np.empty_like(np.asarray(pooled))
    got[np.asarray(order)] = np.asarray(pooled)
    want = np.asarray(batched_multilevel_roi_align(
        feats32, rois, 7, roi_chunk=32)).reshape(64, 7, 7, -1)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_tpu_resident_roi_align_f32_c256_mask14():
    """Compiled resident kernel, f32 C=256 at output_size 14 — the mask/match
    RoI shape of the f32-compute phase-1 path.  Pins the tile_geometry VMEM
    fix: with the [72, 96·256] f32 tiles the 4x larger out block hit a
    compile-time scoped-VMEM OOM (17.04M > 16M — found by the synthetic
    phase-1 CLI smoke after the resident training default flip); the
    [72, 80·256] @ 32-stride layout must compile AND match the exact oracle."""
    from seam_match_rcnn_tpu.ops.pallas_roi_align_resident import (
        pallas_roi_align_resident, tile_geometry)
    from seam_match_rcnn_tpu.ops.roi_align import batched_multilevel_roi_align

    assert tile_geometry(4, 14) == (80, 32)
    feats = [jnp.asarray(f)[None] for f in make_pyramid(seed=33, c=256)]
    rois = jnp.asarray(moderate_rois(64, seed=34))[None]
    pooled, order = pallas_roi_align_resident(
        feats, rois, 14, interpret=False, roi_chunk=64)
    got = np.empty_like(np.asarray(pooled))
    got[np.asarray(order)] = np.asarray(pooled)
    want = np.asarray(batched_multilevel_roi_align(
        feats, rois, 14, roi_chunk=32)).reshape(64, 14, 14, -1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
