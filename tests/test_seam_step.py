import numpy as np
import jax
import jax.numpy as jnp

from seam_match_rcnn_tpu.models.match_head import MatchPredictor, TemporalAggregator
from seam_match_rcnn_tpu.train.optim import sgd
from seam_match_rcnn_tpu.train.seam import (
    HeadState,
    create_head_state,
    make_mdf2_head_step,
    make_seam_head_step,
    merge_head_state,
    select_rows_host,
)


def init_head_variables(seed=0):
    rng = np.random.RandomState(seed)
    roi = jnp.asarray(rng.randn(2, 14, 14, 256).astype(np.float32))
    mp = MatchPredictor()
    ta = TemporalAggregator()
    mp_v = mp.init(jax.random.PRNGKey(0), roi, jnp.asarray([0]), jnp.asarray([1]))
    ta_v = ta.init(
        jax.random.PRNGKey(1), roi, jnp.zeros((1, 2), jnp.int32),
        jnp.ones((1, 2), bool), jnp.asarray([1]),
    )
    return {
        "params": {"match_predictor": mp_v["params"], "temporal_aggregator": ta_v["params"]},
        "batch_stats": {"match_predictor": mp_v["batch_stats"],
                        "temporal_aggregator": ta_v["batch_stats"]},
    }


def make_outputs(n_img, d=4, seed=0, score=0.9):
    rng = np.random.RandomState(seed)
    outs = []
    for _ in range(n_img):
        outs.append({
            "scores": np.full((d,), score, np.float32),
            "boxes": np.abs(rng.rand(d, 4).astype(np.float32)) * 50 + np.asarray([0, 0, 60, 60], np.float32),
            "roi_features": rng.randn(d, 14, 14, 256).astype(np.float32),
            "valid": np.ones((d,), bool),
        })
    return outs


def test_select_rows_host_shop_largest_area():
    # 2 products x (1 shop + 2 frames)
    outs = make_outputs(6, d=3, seed=1)
    tags = [1, 0, 0, 1, 0, 0]
    prods = [0, 0, 0, 1, 1, 1]
    sel = select_rows_host(outs, tags, prods, 0.5, 2, 2, max_rows=32)
    assert sel is not None
    # each shop contributes exactly 1 row
    assert (sel.types[sel.valid] == 1).sum() == 2
    assert (sel.shop_row >= 0).all()
    # street rows: 2 products x 2 frames x 3 boxes
    assert (sel.types[sel.valid] == 0).sum() == 12


def test_select_rows_host_excludes_shopless_product():
    outs = make_outputs(6, d=3, seed=2)
    outs[0]["scores"][:] = 0.0  # product 0's shop has no box
    tags = [1, 0, 0, 1, 0, 0]
    prods = [0, 0, 0, 1, 1, 1]
    sel = select_rows_host(outs, tags, prods, 0.5, 2, 2, max_rows=32)
    assert sel is not None
    assert sel.shop_row[0] == -1
    assert (sel.prod[sel.valid] != 0).all()


def test_select_rows_host_returns_none_when_empty():
    outs = make_outputs(2, d=1, seed=3, score=0.0)
    assert select_rows_host(outs, [1, 0], [0, 0], 0.5, 1, 1, 8) is None


def test_seam_head_step_trains():
    variables = init_head_variables()
    tx = sgd(lambda s: 0.01, momentum=0.9)
    state = create_head_state(variables, tx)
    step = make_seam_head_step(tx, frames_per_product=3, n_frames=2)

    rng = np.random.RandomState(4)
    k, p, t = 16, 2, 3
    prod = np.asarray([0] * 8 + [1] * 8, np.int32)
    types = np.asarray(([1] + [0] * 7) + ([1] + [0] * 7), np.int32)
    img_slot = np.zeros(k, np.int32)
    for r in range(k):
        if types[r] == 0:
            img_slot[r] = prod[r] * t + (r % t)
    batch = {
        "roi_features": jnp.asarray(rng.randn(k, 14, 14, 256).astype(np.float32)),
        "valid": jnp.ones(k, bool),
        "types": jnp.asarray(types),
        "prod": jnp.asarray(prod),
        "img_slot": jnp.asarray(img_slot),
        "shop_row": jnp.asarray([0, 8], jnp.int32),
        "aggr_weight": jnp.asarray(1.0),
    }
    before = state.params["match_predictor"]["trunk"]["linear"]["kernel"]
    for i in range(2):
        state, losses = step(state, batch)
        assert np.isfinite(float(losses["loss"]))
        assert np.isfinite(float(losses["match_loss"]))
        assert np.isfinite(float(losses["aggregation_loss"]))
    after = state.params["match_predictor"]["trunk"]["linear"]["kernel"]
    assert not np.allclose(np.asarray(before), np.asarray(after))
    merged = merge_head_state(variables, state)
    assert "match_predictor" in merged["params"]


def seam_mesh_parity_batch(k_rows, p_products=4, t_frames=2, n_imgs=4,
                           d=3, seed=2):
    """Adversarial row layout for the mesh-parity proofs (VERDICT r4 #3),
    shared by this test, tests/_multihost_worker.py and
    __graft_entry__.dryrun_multichip: the slot-0 winner of product 0 lives
    on the LAST shard (its only street rows are the final two), product 3
    is excluded (shop_row -1), same-slot rows compete across shards, and
    row 13..k-3 are invalid padding.  k_rows must be >= 16."""
    rng = np.random.RandomState(seed)
    valid = np.ones((k_rows,), bool)
    types = np.zeros((k_rows,), np.int32)
    prod = np.zeros((k_rows,), np.int32)
    img_slot = np.zeros((k_rows,), np.int32)
    types[0:3] = 1
    prod[0:3] = [0, 1, 2]
    shop_row = np.asarray([0, 1, 2, -1], np.int32)
    for r, p, slot in ((3, 3, 6), (4, 1, 2), (5, 1, 2), (6, 1, 3),
                       (7, 2, 4), (8, 2, 5), (9, 2, 4), (10, 3, 7),
                       (11, 1, 3), (12, 2, 5)):
        prod[r], img_slot[r] = p, slot
    valid[13:k_rows - 2] = False
    prod[k_rows - 2:] = 0
    img_slot[k_rows - 2], img_slot[k_rows - 1] = 0, 1
    rows = np.arange(k_rows)
    return {
        "row_img": jnp.asarray(rows % n_imgs, jnp.int32),
        "row_det": jnp.asarray(rows % d, jnp.int32),
        "valid": jnp.asarray(valid),
        "types": jnp.asarray(types),
        "prod": jnp.asarray(prod),
        "img_slot": jnp.asarray(img_slot),
        "shop_row": jnp.asarray(shop_row),
        "roi_src": jnp.asarray(
            rng.rand(n_imgs, d, 14, 14, 256).astype(np.float32)),
        "aggr_weight": jnp.asarray(1.0, jnp.float32),
    }


def test_seam_head_step_mesh_parity_bitlevel():
    """make_seam_head_step under the 8-device 'data' mesh == the
    single-device step, to float-assoc tolerance (the phase-1 standard,
    tests/_multihost_worker.py:97-208) — the weak-label argmax/segment-op
    winner selection spans DP-sharded rows (train/seam.py:158-228), which
    is exactly where sharding could silently diverge.  Reference
    semantics replaced: /root/reference/stuffs/engine.py:120-198."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from seam_match_rcnn_tpu.parallel.mesh import make_mesh, replicate

    n = min(8, len(jax.devices()))
    if n < 2:
        import pytest

        pytest.skip("needs >= 2 devices")
    variables = init_head_variables()
    tx = sgd(lambda s: 0.01, momentum=0.9)
    state = create_head_state(variables, tx)
    step = make_seam_head_step(tx, frames_per_product=2, n_frames=2)
    batch = seam_mesh_parity_batch(k_rows=16)

    ref_state, ref_losses = step(state, batch)

    mesh = make_mesh(data=n, model=1)
    sharded = dict(batch)
    for k in ("row_img", "row_det", "valid", "types", "prod", "img_slot"):
        sharded[k] = jax.device_put(batch[k], NamedSharding(mesh, P("data")))
    sharded["roi_src"] = jax.device_put(batch["roi_src"],
                                        NamedSharding(mesh, P()))
    mesh_state, mesh_losses = step(replicate(state, mesh), sharded)

    assert np.isfinite(float(mesh_losses["loss"]))
    delta = max(
        float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
        for a, b in zip(jax.tree.leaves(mesh_state.params),
                        jax.tree.leaves(ref_state.params)))
    assert delta < 1e-4, f"mesh vs single-device param delta {delta}"
    assert abs(float(mesh_losses["loss"]) - float(ref_losses["loss"])) \
        < 1e-5 * (1 + abs(float(ref_losses["loss"])))
    # the adversarial structure actually bites: product 0's winner rows
    # are on the last shard, product 3 is excluded
    assert int(batch["shop_row"][3]) == -1
    assert np.all(np.asarray(batch["prod"][-2:]) == 0)


def test_mdf2_head_step_only_aggregator_trains():
    # weight_decay at the phase-2 default: add_decayed_weights must not
    # leak past the zeroed grads into the frozen match predictor (torch SGD
    # leaves grad-less params untouched; reference trains only the
    # aggregator here, stuffs/engine.py:244-245)
    variables = init_head_variables(seed=5)
    tx = sgd(lambda s: 0.01, momentum=0.9, weight_decay=5e-4)
    state = create_head_state(variables, tx)
    step = make_mdf2_head_step(tx)

    rng = np.random.RandomState(6)
    k, p, t = 12, 2, 4
    batch = {
        "roi_features": jnp.asarray(rng.randn(k, 14, 14, 256).astype(np.float32)),
        "shop_row": jnp.asarray([0, 6], jnp.int32),
        "seq_gather": jnp.asarray([[1, 2, 3, 4], [7, 8, 9, 0]], jnp.int32),
        "seq_mask": jnp.asarray([[True, True, True, True], [True, True, True, False]]),
    }
    mp_before = jax.tree.map(np.asarray, state.params["match_predictor"])
    ta_before = state.params["temporal_aggregator"]["trunk"]["linear"]["kernel"]
    state, losses = step(state, batch)
    assert np.isfinite(float(losses["loss"]))
    for b, a in zip(jax.tree.leaves(mp_before),
                    jax.tree.leaves(state.params["match_predictor"])):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a))
    assert not np.allclose(
        np.asarray(ta_before),
        np.asarray(state.params["temporal_aggregator"]["trunk"]["linear"]["kernel"]),
    )


def test_select_rows_host_skips_when_truncation_drops_all_shops():
    """The skip check must run on the TRUNCATED rows: if every shop row
    falls past max_rows the step is skipped (reference engine.py:153), not
    run with fully-masked losses."""
    outs = make_outputs(3, d=3, seed=7)
    tags = [0, 0, 1]  # streets first: their 6 rows fill max_rows=4
    prods = [0, 0, 0]
    assert select_rows_host(outs, tags, prods, 0.5, 1, 2, max_rows=4) is None
