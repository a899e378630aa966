import numpy as np
import jax.numpy as jnp

from seam_match_rcnn_tpu.ckpt.io import CheckpointManager, restore_checkpoint, save_checkpoint


def test_orbax_roundtrip(tmp_path):
    payload = {
        "variables": {"params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)}},
        "epoch": 7,
    }
    path = str(tmp_path / "ck")
    save_checkpoint(path, payload)
    back = restore_checkpoint(path)
    assert int(back["epoch"]) == 7
    np.testing.assert_array_equal(back["variables"]["params"]["w"], payload["variables"]["params"]["w"])


def test_checkpoint_manager_periodic(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ckpts"), save_epochs=2)
    for ep in range(4):
        mgr.maybe_save(ep, {"epoch": ep, "x": np.zeros(2)})
    mgr.maybe_save(3, {"epoch": 3, "x": np.zeros(2)}, final=True)
    latest = mgr.latest()
    assert latest is not None
    back = restore_checkpoint(latest)
    assert "epoch" in back


def test_checkpoint_jnp_arrays(tmp_path):
    path = str(tmp_path / "jx")
    save_checkpoint(path, {"a": jnp.ones((3,)) * 2})
    back = restore_checkpoint(path)
    np.testing.assert_array_equal(np.asarray(back["a"]), [2, 2, 2])


def test_resume_optstate_roundtrip(tmp_path):
    """--start_ckpt resume semantics: a restored opt_state must feed
    tx.update directly.  Target-less orbax restore returns raw dicts/lists,
    which breaks optax's typed states (attribute access on TraceState) —
    restore_checkpoint(target=...) reimposes the structure."""
    import jax

    from seam_match_rcnn_tpu.train.optim import multistep_warmup_schedule, sgd

    params = {"w": jnp.ones((3,))}
    tx = sgd(multistep_warmup_schedule(0.1, (2,), 0.1, 10, 5, 1e-3),
             momentum=0.9)
    opt_state = tx.init(params)
    path = str(tmp_path / "ck")
    save_checkpoint(
        path, {"state": {"params": params, "opt_state": opt_state, "step": 3}})
    target = {"state": {"params": params, "opt_state": opt_state, "step": 0}}
    back = restore_checkpoint(path, target=target)
    assert int(back["state"]["step"]) == 3
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, back["state"]["opt_state"], params)
    assert jnp.all(jnp.isfinite(updates["w"]))


def test_phase2_resume_payload_roundtrip(tmp_path):
    """train_movingfashion/multidf2 save {variables, head_state, epoch} and
    resume by restoring into a live-target structure; the restored
    HeadState must feed tx.update (typed opt_state preserved)."""
    import jax

    from seam_match_rcnn_tpu.train.optim import multistep_warmup_schedule, sgd
    from seam_match_rcnn_tpu.train.seam import HeadState, create_head_state

    variables = {
        "params": {
            "match_predictor": {"w": jnp.ones((2, 2))},
            "temporal_aggregator": {"v": jnp.zeros((3,))},
            "backbone": {"k": jnp.ones((2,))},
        },
        "batch_stats": {
            "match_predictor": {"m": jnp.zeros((2,))},
            "temporal_aggregator": {"m": jnp.zeros((3,))},
        },
    }
    tx = sgd(multistep_warmup_schedule(0.04, (15,), 0.1, 10, 5, 1e-3),
             momentum=0.9)
    head_state = create_head_state(variables, tx)
    path = str(tmp_path / "ck")
    save_checkpoint(path, {"variables": variables,
                           "head_state": head_state._asdict(), "epoch": 4})
    payload = restore_checkpoint(
        path, target={"variables": variables,
                      "head_state": head_state._asdict(), "epoch": 0})
    back = HeadState(**payload["head_state"])
    assert int(payload["epoch"]) == 4
    grads = jax.tree.map(jnp.ones_like, back.params)
    updates, _ = tx.update(grads, back.opt_state, back.params)
    assert all(jnp.all(jnp.isfinite(x)) for x in jax.tree.leaves(updates))


def test_reimpose_types_matches_namedtuple_fields_by_name():
    """A dict node restored where the target holds a NamedTuple whose field
    order is NOT alphabetical must merge by field name — a flat-leaf
    unflatten would permute (dict leaves flatten key-sorted) and corrupt
    opt_state silently (ADVICE r1)."""
    import collections

    from seam_match_rcnn_tpu.ckpt.io import _reimpose_types

    State = collections.namedtuple("State", ["zeta", "alpha"])  # z before a
    target = {"s": State(zeta=np.zeros(2), alpha=np.zeros(3))}
    restored = {"s": {"alpha": np.full(3, 1.0), "zeta": np.full(2, 9.0)}}
    out = _reimpose_types(target, restored)
    assert isinstance(out["s"], State)
    np.testing.assert_array_equal(out["s"].zeta, np.full(2, 9.0))
    np.testing.assert_array_equal(out["s"].alpha, np.full(3, 1.0))


def test_reimpose_types_fails_loudly_on_mismatch(tmp_path):
    import collections

    import pytest

    from seam_match_rcnn_tpu.ckpt.io import _reimpose_types

    State = collections.namedtuple("State", ["a", "b"])
    with pytest.raises(KeyError):
        _reimpose_types({"s": State(1, 2)}, {"s": {"a": 1, "WRONG": 2}})
    with pytest.raises(ValueError):
        _reimpose_types({"s": State(1, 2)}, {"s": [1, 2, 3]})
    with pytest.raises(ValueError):
        _reimpose_types({"s": [1, 2]}, {"s": [1, 2, 3]})


def test_latest_skips_timestamped_orbax_tmp(tmp_path):
    """Orbax names staging dirs <name>.orbax-checkpoint-tmp[-<timestamp>]
    (orbax _src/path/temporary_paths.py) — a crash-leftover must never be
    picked by latest() and must be swept by _clear_mid."""
    import os

    from seam_match_rcnn_tpu.ckpt.io import CheckpointManager, save_checkpoint

    mgr = CheckpointManager(str(tmp_path), save_epochs=2)
    mgr.maybe_save(0, {"x": 1})
    for leftover in ("epoch002.orbax-checkpoint-tmp",
                     "epoch002.orbax-checkpoint-tmp-1723948571"):
        os.makedirs(tmp_path / leftover)
    assert mgr.latest() == str(tmp_path / "epoch000")
    mgr._clear_mid()
    names = set(os.listdir(tmp_path))
    assert "epoch002.orbax-checkpoint-tmp" not in names
    assert "epoch002.orbax-checkpoint-tmp-1723948571" not in names
    assert "epoch000" in names


def test_latest_prefers_newer_epoch_over_stale_final(tmp_path):
    """--auto_resume relaunch scenario: a completed run's 'final' is OLDER
    than the relaunch's epoch saves — latest() ranks by mtime, not
    alphabetically ('final' > 'epochNNN' lexically)."""
    import os
    import time

    from seam_match_rcnn_tpu.ckpt.io import CheckpointManager

    mgr = CheckpointManager(str(tmp_path), save_epochs=2)
    mgr.maybe_save(11, {"x": 1}, final=True)          # first run completes
    mgr.maybe_save(14, {"x": 2})                      # relaunch, more epochs
    old = time.time() - 3600
    os.utime(tmp_path / "final", (old, old))          # make recency explicit
    assert mgr.latest() == str(tmp_path / "epoch014")
    # and mid, when present, is the newest of all
    mgr.save_mid({"x": 3})
    assert mgr.latest() == str(tmp_path / "mid")


def test_maybe_save_zero_save_epochs(tmp_path):
    """save_epochs 0 disables periodic saves (final only), not a crash."""
    mgr = CheckpointManager(str(tmp_path), save_epochs=0)
    mgr.maybe_save(0, {"x": 1})
    assert mgr.latest() is None
    mgr.maybe_save(3, {"x": 2}, final=True)
    assert mgr.latest().endswith("final")
