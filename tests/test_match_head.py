import numpy as np
import jax
import jax.numpy as jnp

from seam_match_rcnn_tpu.models.match_head import (
    MatchTrunk,
    NonLocalBlock1D,
    TemporalAggregator,
)
from seam_match_rcnn_tpu.ops.pairwise import pairwise_match_logits, pairwise_match_scores


def test_pairwise_logits_match_naive():
    rng = np.random.RandomState(0)
    x = rng.randn(7, 256).astype(np.float32)
    y = rng.randn(5, 256).astype(np.float32)
    w = rng.randn(2, 256).astype(np.float32)
    b = rng.randn(2).astype(np.float32)
    got = np.asarray(pairwise_match_logits(*map(jnp.asarray, (x, y, w, b))))
    want = ((x[:, None] - y[None]) ** 2) @ w.T + b
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
    scores = np.asarray(pairwise_match_scores(*map(jnp.asarray, (x, y, w, b))))
    e = np.exp(want - want.max(-1, keepdims=True))
    np.testing.assert_allclose(scores, (e / e.sum(-1, keepdims=True))[..., 1], rtol=1e-4, atol=1e-5)


def nlb_ref(x, params):
    """Naive per-sequence non-local block (true length, no padding)."""
    th = x @ params["theta"]["kernel"] + params["theta"]["bias"]
    ph = x @ params["phi"]["kernel"] + params["phi"]["bias"]
    g = x @ params["g"]["kernel"] + params["g"]["bias"]
    wcat = params["concat_w"]
    inter = th.shape[-1]
    t = x.shape[0]
    f = np.zeros((t, t), dtype=np.float64)
    for i in range(t):
        for j in range(t):
            cat = np.concatenate([th[i], ph[j]])
            f[i, j] = max(float(cat @ wcat[:, 0]), 0.0)
    f = f / t
    y = f @ g
    wz = y @ params["w_z"]["kernel"] + params["w_z"]["bias"]
    return wz + x


def test_nlb_masked_matches_per_sequence():
    rng = np.random.RandomState(1)
    c = 16
    mod = NonLocalBlock1D(in_channels=c)
    lens = [4, 2, 1, 3]
    T = max(lens)
    x = np.zeros((len(lens), T, c), dtype=np.float32)
    seqs = [rng.randn(l, c).astype(np.float32) for l in lens]
    mask = np.zeros((len(lens), T), dtype=bool)
    for i, s in enumerate(seqs):
        x[i, : len(s)] = s
        mask[i, : len(s)] = True

    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(mask))["params"]
    # w_z is zero-init (identity residual); randomize to exercise the path.
    params = jax.tree.map(lambda p: p, params)
    params = dict(params)
    params["w_z"] = {
        "kernel": jnp.asarray(rng.randn(c // 2, c).astype(np.float32) * 0.1),
        "bias": jnp.asarray(rng.randn(c).astype(np.float32) * 0.1),
    }
    got = np.asarray(mod.apply({"params": params}, jnp.asarray(x), jnp.asarray(mask)))

    np_params = jax.tree.map(np.asarray, params)
    for i, s in enumerate(seqs):
        if len(s) > 1:
            want = nlb_ref(s.astype(np.float64), np_params)
        else:
            want = s  # reference skips NLB for single-frame sequences
        np.testing.assert_allclose(got[i, : len(s)], want, rtol=1e-4, atol=1e-4)


def test_nlb_zero_init_is_identity():
    mod = NonLocalBlock1D(in_channels=8)
    x = jnp.asarray(np.random.RandomState(2).randn(2, 5, 8).astype(np.float32))
    mask = jnp.ones((2, 5), dtype=bool)
    params = mod.init(jax.random.PRNGKey(0), x, mask)
    out = mod.apply(params, x, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


def test_trunk_shapes_and_bn_modes():
    mod = MatchTrunk()
    x = jnp.asarray(np.random.RandomState(3).randn(6, 14, 14, 256).astype(np.float32))
    variables = mod.init(jax.random.PRNGKey(0), x, train=False)
    out = mod.apply(variables, x, train=False)
    assert out.shape == (6, 256)
    out2, updates = mod.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    assert out2.shape == (6, 256)
    assert "batch_stats" in updates


def test_aggregator_full_forward():
    rng = np.random.RandomState(4)
    mod = TemporalAggregator()
    k = 8
    roi = jnp.asarray(rng.randn(k, 14, 14, 256).astype(np.float32))
    seq_gather = jnp.asarray([[0, 1, 2], [3, 4, 4]])
    seq_mask = jnp.asarray([[True, True, True], [True, True, False]])
    shop_idx = jnp.asarray([5, 6, 7])
    variables = mod.init(
        jax.random.PRNGKey(0), roi, seq_gather, seq_mask, shop_idx, train=False
    )
    desc, aggregated, logits = mod.apply(
        variables, roi, seq_gather, seq_mask, shop_idx, train=False
    )
    assert desc.shape == (k, 256)
    assert aggregated.shape == (2, 256)
    assert logits.shape == (2, 3, 2)
    assert np.isfinite(np.asarray(logits)).all()


def test_aggregator_attention_ignores_padding():
    rng = np.random.RandomState(5)
    mod = TemporalAggregator()
    roi = jnp.asarray(rng.randn(4, 14, 14, 256).astype(np.float32))
    variables = mod.init(
        jax.random.PRNGKey(0), roi, jnp.zeros((1, 2), jnp.int32),
        jnp.ones((1, 2), bool), jnp.asarray([3]), train=False,
    )
    # Same valid frames, different garbage in the padded slot.
    g1 = jnp.asarray([[0, 1, 2]])
    m = jnp.asarray([[True, True, False]])
    desc = mod.apply(variables, roi, method=lambda m_, r: m_.descriptors(r))
    seq_a = desc[g1] * m[..., None]
    seq_b = seq_a.at[0, 2].set(99.0)
    agg = lambda s: mod.apply(variables, s, m, method=lambda m_, s_, k_: m_.aggregate(s_, k_))
    np.testing.assert_allclose(np.asarray(agg(seq_a)), np.asarray(agg(seq_b)), atol=1e-5)


def test_masked_bn_freezes_stats_when_all_rows_invalid():
    """An all-masked training batch (e.g. an image pair with zero positive
    match slots) must NOT decay the running stats toward 0 — the momentum
    update is zero-weighted when no row is valid."""
    from seam_match_rcnn_tpu.models.match_head import MaskedBatchNorm1d

    bn = MaskedBatchNorm1d()
    x = jnp.asarray(np.random.RandomState(0).randn(6, 8).astype(np.float32))
    variables = bn.init(jax.random.PRNGKey(0), x, train=True,
                        valid=jnp.ones(6, bool))
    # one real step moves the stats
    _, mut = bn.apply(variables, x + 3.0, train=True,
                      valid=jnp.ones(6, bool), mutable=["batch_stats"])
    assert not np.allclose(np.asarray(mut["batch_stats"]["mean"]),
                           np.asarray(variables["batch_stats"]["mean"]))
    # an all-masked step must leave them untouched
    _, mut0 = bn.apply(variables, x + 3.0, train=True,
                       valid=jnp.zeros(6, bool), mutable=["batch_stats"])
    np.testing.assert_array_equal(
        np.asarray(mut0["batch_stats"]["mean"]),
        np.asarray(variables["batch_stats"]["mean"]))
    np.testing.assert_array_equal(
        np.asarray(mut0["batch_stats"]["var"]),
        np.asarray(variables["batch_stats"]["var"]))


def test_trunk_dtype_knob_bf16_close_and_param_compatible():
    """MatchHeadConfig.trunk_dtype="bfloat16" runs ONLY the 4 conv layers in
    bf16 (PERF.md round 4 serving-tail lever); the 6x6 pool, 1024->256
    projection, BN and descriptors stay f32.  Gate: same param tree as the
    f32 trunk (checkpoint-converter compatibility) and descriptor drift
    within the bf16 rounding budget on O(1) BN-normalized outputs."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(6, 14, 14, 256).astype(np.float32))
    f32 = MatchTrunk(dtype=jnp.float32)
    b16 = MatchTrunk(dtype=jnp.bfloat16)
    v = f32.init(jax.random.PRNGKey(0), x, train=False)
    v16 = b16.init(jax.random.PRNGKey(0), x, train=False)
    assert jax.tree.map(lambda a: (a.shape, a.dtype), v) == jax.tree.map(
        lambda a: (a.shape, a.dtype), v16)  # params f32 either way
    d32 = np.asarray(f32.apply(v, x, train=False))
    d16 = np.asarray(b16.apply(v, x, train=False))
    assert d16.dtype == np.float32
    assert np.max(np.abs(d16 - d32)) < 0.08, np.max(np.abs(d16 - d32))
    # descriptors are unit-scale after BN; require tight agreement in bulk
    assert np.mean(np.abs(d16 - d32)) < 0.02


def test_model_trunk_dtype_reaches_match_heads():
    """ModelConfig.match.trunk_dtype threads through MatchRCNN.setup to both
    the match predictor and the temporal aggregator trunks; the default
    stays f32 (reference numerics — descriptor parity contract)."""
    import dataclasses

    from seam_match_rcnn_tpu.config import MatchHeadConfig, ModelConfig

    assert ModelConfig().match.trunk_dtype == "float32"
    from seam_match_rcnn_tpu.config import serving_model_config

    assert serving_model_config().match.trunk_dtype == "float32"
    cfg = dataclasses.replace(
        ModelConfig(), match=MatchHeadConfig(trunk_dtype="bfloat16"))
    from seam_match_rcnn_tpu.models.matchrcnn import MatchRCNN

    m = MatchRCNN(cfg=cfg, video=True)
    variables = m.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 14, 14, 256), jnp.float32),
        method=MatchRCNN.match_descriptors,
    )
    bound = m.bind(variables)
    assert bound.match_predictor.dtype == jnp.bfloat16
    assert bound.match_predictor.trunk.dtype == jnp.bfloat16
    assert bound.temporal_aggregator.dtype == jnp.bfloat16
    assert bound.temporal_aggregator.trunk.dtype == jnp.bfloat16
