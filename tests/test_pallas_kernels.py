"""Pallas kernels vs the jnp oracles, in interpreter mode (CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from seam_match_rcnn_tpu.models.match_head import TemporalAggregator
from seam_match_rcnn_tpu.ops.pairwise import pairwise_match_scores
from seam_match_rcnn_tpu.ops.pallas_kernels import nlb_aggregate, pairwise_scores


def test_pairwise_scores_kernel_matches_xla():
    rng = np.random.RandomState(0)
    q, g = 300, 200
    x = rng.randn(q, 256).astype(np.float32)
    y = rng.randn(g, 256).astype(np.float32)
    w = rng.randn(2, 256).astype(np.float32)
    b = rng.randn(2).astype(np.float32)
    want = np.asarray(pairwise_match_scores(*map(jnp.asarray, (x, y, w, b))))
    got = np.asarray(pairwise_scores(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(w), jnp.asarray(b),
        tile_q=128, tile_g=128, interpret=True,
    ))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_pairwise_scores_kernel_ragged_sizes():
    rng = np.random.RandomState(1)
    x = rng.randn(37, 256).astype(np.float32)
    y = rng.randn(5, 256).astype(np.float32)
    w = rng.randn(2, 256).astype(np.float32)
    b = rng.randn(2).astype(np.float32)
    want = np.asarray(pairwise_match_scores(*map(jnp.asarray, (x, y, w, b))))
    got = np.asarray(pairwise_scores(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(w), jnp.asarray(b),
        tile_q=128, tile_g=128, interpret=True,
    ))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_nlb_aggregate_kernel_matches_module():
    rng = np.random.RandomState(2)
    mod = TemporalAggregator()
    roi = jnp.asarray(rng.randn(2, 14, 14, 256).astype(np.float32))
    variables = mod.init(
        jax.random.PRNGKey(0), roi, jnp.zeros((1, 2), jnp.int32),
        jnp.ones((1, 2), bool), jnp.asarray([1]),
    )
    params = variables["params"]
    # randomize the zero-init w_z so the NLB path is exercised
    params = jax.tree.map(lambda p: p, params)
    params["nlb"]["w_z"] = {
        "kernel": jnp.asarray(rng.randn(128, 256).astype(np.float32) * 0.05),
        "bias": jnp.asarray(rng.randn(256).astype(np.float32) * 0.05),
    }
    variables = {"params": params, "batch_stats": variables["batch_stats"]}

    s, t = 3, 5
    seqs = rng.randn(s, t, 256).astype(np.float32)
    mask = np.asarray([
        [True, True, True, True, False],
        [True, False, False, False, False],   # single-frame: NLB skipped
        [True, True, False, False, False],
    ])
    seqs = seqs * mask[..., None]
    want = np.asarray(mod.apply(
        variables, jnp.asarray(seqs), jnp.asarray(mask),
        method=TemporalAggregator.aggregate,
    ))
    got = np.asarray(nlb_aggregate(
        jnp.asarray(seqs), jnp.asarray(mask), params, interpret=True
    ))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
