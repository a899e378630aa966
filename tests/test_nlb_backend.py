"""TemporalAggregator with the fused Pallas NLB backend matches the XLA path."""

import numpy as np
import jax
import jax.numpy as jnp

from seam_match_rcnn_tpu.models.match_head import TemporalAggregator


def test_aggregate_pallas_backend_matches_xla():
    rng = np.random.RandomState(0)
    roi = jnp.asarray(rng.randn(2, 14, 14, 256).astype(np.float32))
    mod_x = TemporalAggregator(nlb_backend="xla")
    variables = mod_x.init(
        jax.random.PRNGKey(0), roi, jnp.zeros((1, 2), jnp.int32),
        jnp.ones((1, 2), bool), jnp.asarray([1]),
    )
    # randomize the zero-init NLB output projection
    params = dict(variables["params"])
    params["nlb"] = dict(params["nlb"])
    params["nlb"]["w_z"] = {
        "kernel": jnp.asarray(rng.randn(128, 256).astype(np.float32) * 0.05),
        "bias": jnp.asarray(rng.randn(256).astype(np.float32) * 0.05),
    }
    variables = {"params": params, "batch_stats": variables["batch_stats"]}

    seqs = jnp.asarray(rng.randn(3, 4, 256).astype(np.float32))
    mask = jnp.asarray([[1, 1, 1, 0], [1, 0, 0, 0], [1, 1, 1, 1]], bool)
    seqs = seqs * mask[..., None]

    want = mod_x.apply(variables, seqs, mask, method=TemporalAggregator.aggregate)
    mod_p = TemporalAggregator(nlb_backend="pallas_interpret")
    got = mod_p.apply(variables, seqs, mask, method=TemporalAggregator.aggregate)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_pallas_backend_init_works():
    rng = np.random.RandomState(1)
    roi = jnp.asarray(rng.randn(2, 14, 14, 256).astype(np.float32))
    mod = TemporalAggregator(nlb_backend="pallas_interpret")
    variables = mod.init(
        jax.random.PRNGKey(0), roi, jnp.zeros((1, 2), jnp.int32),
        jnp.ones((1, 2), bool), jnp.asarray([1]),
    )
    assert "nlb" in variables["params"]
    out = mod.apply(
        variables, roi, jnp.zeros((1, 2), jnp.int32),
        jnp.ones((1, 2), bool), jnp.asarray([1]),
    )
    assert np.isfinite(np.asarray(out[2])).all()
