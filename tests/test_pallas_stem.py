"""Fused Pallas stem vs the XLA conv1+BN+relu+maxpool reference.

Border semantics must match torchvision exactly: conv pad 3, pool
3x3/s2/pad1 with -inf padding (realized as 0-padding on relu outputs).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from seam_match_rcnn_tpu.ops.pallas_stem import (fused_stem,
                                                 rearrange_stem_weights)


def xla_stem(x, w, scale, shift):
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), w.astype(jnp.float32), (2, 2),
        [(3, 3), (3, 3)], dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y * scale[None, None, None, :] + shift[None, None, None, :]
    y = jnp.maximum(y, 0.0)
    return jax.lax.reduce_window(
        y, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)])


def _case(h, w, b=1, seed=0, tol=0.02):
    rng = np.random.RandomState(seed)
    x = rng.randn(b, h, w, 3).astype(np.float32)
    cw = (rng.randn(7, 7, 3, 64) * 0.2).astype(np.float32)
    scale = (0.5 + rng.rand(64)).astype(np.float32)
    shift = rng.randn(64).astype(np.float32)
    got = np.asarray(fused_stem(jnp.asarray(x), jnp.asarray(cw),
                                jnp.asarray(scale), jnp.asarray(shift),
                                interpret=True))
    want = np.asarray(xla_stem(jnp.asarray(x), jnp.asarray(cw),
                               jnp.asarray(scale), jnp.asarray(shift)))
    assert got.shape == want.shape == (b, h // 4, w // 4, 64)
    s = max(1.0, np.abs(want).max())
    # bf16 inputs in the kernel vs f32 XLA reference: bf16-rounding bound
    np.testing.assert_allclose(got, want, atol=tol * s)
    # borders specifically (the hand-rolled pad semantics)
    np.testing.assert_allclose(got[:, 0], want[:, 0], atol=tol * s)
    np.testing.assert_allclose(got[:, -1], want[:, -1], atol=tol * s)
    np.testing.assert_allclose(got[:, :, 0], want[:, :, 0], atol=tol * s)
    np.testing.assert_allclose(got[:, :, -1], want[:, :, -1], atol=tol * s)


def test_small_canvas():
    _case(64, 96)


def test_strip_boundary_and_batch():
    # outh=32 -> 4 strips; batch 2 exercises the grid's image axis
    _case(128, 64, b=2, seed=1)


def test_non_strip_multiple_height():
    # outh=24 -> 3 strips exactly; 40 -> 5x8 exact; use h=160 (outh 40)
    _case(160, 128, seed=2)


def test_model_stem_backend_parity_and_param_tree():
    """ModelConfig.stem_backend='pallas' produces the same backbone
    features as 'xla' (bf16-bounded) from the SAME parameter tree —
    checkpoints interchange freely."""
    from seam_match_rcnn_tpu.models.resnet import BackboneWithFPN

    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32))
    bb_x = BackboneWithFPN(dtype=jnp.float32, stem_backend="xla")
    bb_p = BackboneWithFPN(dtype=jnp.float32, stem_backend="pallas")
    v = bb_x.init(jax.random.PRNGKey(0), x)
    # identical parameter trees (paths AND shapes)
    v2 = bb_p.init(jax.random.PRNGKey(0), x)
    p1 = jax.tree_util.tree_flatten_with_path(v)[0]
    p2 = jax.tree_util.tree_flatten_with_path(v2)[0]
    assert [(jax.tree_util.keystr(k), tuple(a.shape)) for k, a in p1] \
        == [(jax.tree_util.keystr(k), tuple(a.shape)) for k, a in p2]
    fx = bb_x.apply(v, x)
    fp = bb_p.apply(v, x)
    for lv, (a, b) in enumerate(zip(fx, fp)):
        a, b = np.asarray(a), np.asarray(b)
        s = max(1.0, np.abs(a).max())
        np.testing.assert_allclose(a, b, atol=0.05 * s,
                                   err_msg=f"FPN level {lv}")


@pytest.mark.tpu
def test_compiled_matches_xla_on_tpu():
    rng = np.random.RandomState(3)
    x = rng.randn(2, 256, 320, 3).astype(np.float32)
    cw = (rng.randn(7, 7, 3, 64) * 0.2).astype(np.float32)
    scale = (0.5 + rng.rand(64)).astype(np.float32)
    shift = rng.randn(64).astype(np.float32)
    got = np.asarray(fused_stem(jnp.asarray(x), jnp.asarray(cw),
                                jnp.asarray(scale), jnp.asarray(shift)))
    want = np.asarray(xla_stem(jnp.asarray(x), jnp.asarray(cw),
                               jnp.asarray(scale), jnp.asarray(shift)))
    s = max(1.0, np.abs(want).max())
    np.testing.assert_allclose(got, want, atol=0.02 * s)


def test_serving_default_is_fused_stem():
    """Serving profile uses the fused stem (same-session A/B 80.10 vs
    79.52 fps, PERF.md round 5); the base/training config keeps the
    differentiable XLA stem."""
    from seam_match_rcnn_tpu.config import ModelConfig, serving_model_config

    assert serving_model_config().stem_backend == "pallas"
    assert ModelConfig().stem_backend == "xla"
