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
