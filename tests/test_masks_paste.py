import numpy as np
import jax.numpy as jnp
import pytest

from seam_match_rcnn_tpu.ops.masks import paste_masks
from seam_match_rcnn_tpu.ops.pairwise import pairwise_match_logits, pairwise_match_scores


def test_paste_full_mask_fills_box():
    mask = jnp.ones((1, 28, 28))
    boxes = jnp.asarray([[10.0, 20.0, 40.0, 60.0]])
    out = np.asarray(paste_masks(mask, boxes, 80, 60))
    assert out.shape == (1, 80, 60)
    # interior well inside the box is ~1
    assert out[0, 30:50, 15:35].min() > 0.9
    # outside the box is 0
    assert out[0, :15, :].max() == 0
    assert out[0, 65:, :].max() == 0
    assert out[0, :, 45:].max() == 0


def test_paste_half_mask_orientation():
    mask = np.zeros((1, 28, 28), np.float32)
    mask[0, :, :14] = 1.0  # left half
    out = np.asarray(paste_masks(jnp.asarray(mask), jnp.asarray([[0.0, 0.0, 40.0, 40.0]]), 40, 40))
    assert out[0, 15:25, 2:15].mean() > 0.8
    assert out[0, 15:25, 25:38].mean() < 0.2


def test_scores_equal_softmax_of_logits():
    rng = np.random.RandomState(1)
    x = rng.randn(9, 256).astype(np.float32)
    y = rng.randn(6, 256).astype(np.float32)
    w = rng.randn(2, 256).astype(np.float32)
    b = rng.randn(2).astype(np.float32)
    logits = np.asarray(pairwise_match_logits(*map(jnp.asarray, (x, y, w, b))))
    e = np.exp(logits - logits.max(-1, keepdims=True))
    want = (e / e.sum(-1, keepdims=True))[..., 1]
    got = np.asarray(pairwise_match_scores(*map(jnp.asarray, (x, y, w, b))))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)
