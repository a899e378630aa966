"""Golden tests for the in-graph weak-winner selection that drives the SEAM
phase-2 losses (train/seam._group_winners)."""

import numpy as np
import jax.numpy as jnp

from seam_match_rcnn_tpu.train.seam import _group_winners


def test_group_winners_basic():
    score = jnp.asarray([0.1, 0.9, 0.5, 0.7, -20.0])
    grp = jnp.asarray([0, 0, 1, 1, 2])
    ok = jnp.ones(5, bool)
    w, v, m = _group_winners(score, grp, ok, num_groups=3)
    assert np.asarray(w).tolist() == [1, 3, 4]
    assert np.asarray(v).tolist() == [True, True, True]
    np.testing.assert_allclose(np.asarray(m), [0.9, 0.7, -20.0])


def test_group_winners_empty_group_and_mask():
    score = jnp.asarray([0.5, 0.6, 0.4])
    grp = jnp.asarray([0, 0, 0])
    ok = jnp.asarray([True, False, True])  # row 1 masked out
    w, v, m = _group_winners(score, grp, ok, num_groups=2)
    assert int(w[0]) == 0            # masked 0.6 ignored, 0.5 wins
    assert bool(v[0]) and not bool(v[1])


def test_group_winners_tie_prefers_first_row():
    score = jnp.asarray([0.5, 0.5, 0.5])
    grp = jnp.asarray([0, 0, 0])
    w, v, _ = _group_winners(score, grp, jnp.ones(3, bool), num_groups=1)
    assert int(w[0]) == 0  # torch argmax tie-breaking: first index
