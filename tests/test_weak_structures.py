"""Oracle test for build_weak_structures — the data-dependent heart of the
SEAM phase-2 losses — including the row-0 clobber regression (an invalid
group's padded winner index must not overwrite row 0's label)."""

import numpy as np
import jax.numpy as jnp

from seam_match_rcnn_tpu.train.seam import build_weak_structures


def oracle(logits, valid, types, prod, img_slot, shop_row, t_max, n_frames, thr):
    k, p = logits.shape[:2]
    shop_ok = shop_row >= 0
    gts = np.zeros((k, p), np.int64)
    winners = {}
    for g in range(p * t_max):
        rows = [r for r in range(k)
                if img_slot[r] == g and valid[r] and types[r] == 0 and shop_ok[prod[r]]]
        if not rows:
            continue
        scores = [logits[r, prod[r], 1] for r in rows]
        best = rows[int(np.argmax(scores))]
        if scores[int(np.argmax(scores))] > thr:
            winners[g] = best
            gts[best, prod[best]] = 1
    seq_mask = np.zeros((p, t_max), bool)
    seq_gather = np.zeros((p, t_max), np.int64)
    for g, r in winners.items():
        seq_gather[g // t_max, g % t_max] = r
        seq_mask[g // t_max, g % t_max] = True
    seq_ok = (seq_mask.sum(1) >= n_frames) & shop_ok
    bn = np.zeros(k, bool)
    for r in winners.values():
        bn[r] = True
    for pi in range(p):
        if seq_ok[pi]:
            bn[shop_row[pi]] = True
    return gts, seq_gather, seq_mask, seq_ok, bn


def test_weak_structures_match_oracle_with_row0_winner_and_empty_group():
    rng = np.random.RandomState(0)
    k, p, t = 10, 3, 2
    logits = rng.randn(k, p, 2).astype(np.float32)
    valid = np.ones(k, bool)
    # row 0: street of product 0 slot 0 — a winner candidate at index 0
    types = np.asarray([0, 0, 1, 0, 0, 1, 0, 0, 0, 0], np.int32)
    prod = np.asarray([0, 0, 0, 1, 1, 1, 2, 2, 2, 2], np.int32)
    img_slot = np.asarray([0, 0, 0, 2, 3, 0, 4, 4, 5, 5], np.int32)
    shop_row = np.asarray([2, 5, -1], np.int32)  # product 2 has NO shop
    logits[0, 0, 1] = 5.0   # row 0 wins its group
    logits[1, 0, 1] = 1.0

    got = build_weak_structures(
        jnp.asarray(logits), jnp.asarray(valid), jnp.asarray(types),
        jnp.asarray(prod), jnp.asarray(img_slot), jnp.asarray(shop_row),
        t_max=t, n_frames=1, match_threshold=-10.0,
    )
    w_gts, w_gather, w_mask, w_ok, w_bn = oracle(
        logits, valid, types, prod, img_slot, shop_row, t, 1, -10.0
    )
    np.testing.assert_array_equal(np.asarray(got["gts"]), w_gts)
    assert w_gts[0, 0] == 1  # the row-0 winner survives (regression)
    np.testing.assert_array_equal(np.asarray(got["seq_mask"]), w_mask)
    m = w_mask.reshape(-1)
    np.testing.assert_array_equal(
        np.asarray(got["seq_gather"]).reshape(-1)[m], w_gather.reshape(-1)[m]
    )
    np.testing.assert_array_equal(np.asarray(got["seq_ok"]), w_ok)
    np.testing.assert_array_equal(np.asarray(got["ta_bn_valid"]), w_bn)


def test_weak_structures_threshold_blocks_all():
    k, p, t = 4, 2, 1
    logits = np.full((k, p, 2), -50.0, np.float32)
    got = build_weak_structures(
        jnp.asarray(logits), jnp.ones(k, bool),
        jnp.asarray([0, 0, 1, 1], jnp.int32), jnp.asarray([0, 0, 0, 1], jnp.int32),
        jnp.asarray([0, 0, 0, 1], jnp.int32), jnp.asarray([2, 3], jnp.int32),
        t_max=t, n_frames=1, match_threshold=-10.0,
    )
    assert int(np.asarray(got["gts"]).sum()) == 0
    assert not np.asarray(got["seq_ok"]).any()
    assert not np.asarray(got["ta_bn_valid"]).any()
