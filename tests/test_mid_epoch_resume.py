"""Mid-epoch checkpoint/resume: interrupted + resumed == uninterrupted.

Beyond-reference robustness for preemptible TPU jobs (the reference only
torch.saves between epochs, /root/reference/train_matchrcnn.py:90-105):
the engine calls save_fn(state, rng, step_in_epoch) every
``save_every_steps`` batches, and resuming from that snapshot with the
remaining batches must reproduce the uninterrupted run bit-for-bit.
"""

import dataclasses
from collections import namedtuple

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seam_match_rcnn_tpu.ckpt.io import (CheckpointManager,
                                         restore_training_checkpoint)
from seam_match_rcnn_tpu.config import TransformConfig
from seam_match_rcnn_tpu.train.engine import train_one_epoch_matchrcnn


@dataclasses.dataclass(frozen=True)
class TinyTransform(TransformConfig):
    min_size: int = 48
    max_size: int = 64

    @property
    def landscape_canvas(self):
        return (48, 64)

    @property
    def portrait_canvas(self):
        return (64, 48)


FakeState = namedtuple("FakeState", "step x")
FakeModel = namedtuple("FakeModel", "cfg")
FakeCfg = namedtuple("FakeCfg", "transform")


def _step_fn(state, batch, rng):
    # deterministic arithmetic over batch content + rng so any divergence
    # in batch order, rng chain, or state shows up in x
    mix = (jnp.sum(batch["images"]) + jnp.sum(batch["gt"]["boxes"])
           + jax.random.uniform(rng, ()))
    new = FakeState(step=state.step + 1, x=state.x * 1.000001 + mix)
    return new, {"loss": mix}


def _batches(n, skip=0):
    rng = np.random.RandomState(0)
    for i in range(n):
        imgs = [rng.rand(40, 56, 3).astype(np.float32) for _ in range(2)]
        tgts = [
            {
                "boxes": np.asarray([[1.0, 2.0, 20.0, 30.0]], np.float32),
                "labels": np.asarray([1 + i % 3]),
                "pair_ids": np.asarray([1]),
                "styles": np.asarray([1]),
                "sources": np.asarray([j % 2]),
                "mask_crops": np.zeros((1, 8, 8), np.uint8),
            }
            for j in range(2)
        ]
        if i >= skip:
            yield imgs, tgts, [i * 2, i * 2 + 1]


def _run(n_batches, skip=0, state=None, rng=None, save_fn=None,
         save_every=0):
    model = FakeModel(cfg=FakeCfg(transform=TinyTransform()))
    if state is None:
        state = FakeState(step=jnp.int32(0), x=jnp.float32(1.0))
    if rng is None:
        rng = jax.random.PRNGKey(7)
    return train_one_epoch_matchrcnn(
        model, state, _step_fn, _batches(n_batches, skip), epoch=0, rng=rng,
        print_freq=100, g_max=4, start_step=skip,
        save_every_steps=save_every, save_fn=save_fn,
    )


def test_resume_reproduces_uninterrupted_run():
    n = 6
    full_state, full_rng = _run(n)

    snaps = {}
    _run(n, save_every=2,
         save_fn=lambda st, rk, c: snaps.__setitem__(c, (st, rk)))
    assert sorted(snaps) == [1, 3, 5]  # after batches 2, 4, 6

    for cut in (1, 3):
        st, rk = snaps[cut]
        res_state, res_rng = _run(n, skip=cut + 1, state=st, rng=rk)
        assert int(res_state.step) == int(full_state.step)
        np.testing.assert_array_equal(np.asarray(res_state.x),
                                      np.asarray(full_state.x))
        np.testing.assert_array_equal(np.asarray(res_rng),
                                      np.asarray(full_rng))


class _FakeProductDataset:
    """Stub with the surface product_batches touches; records what was
    actually materialised so skip-fast-forward can prove it never loads."""

    def __init__(self, n):
        self.n = n
        self.loaded = []

    def __len__(self):
        return self.n

    # MovingFashion surface
    def shop_image(self, i):
        self.loaded.append(("shop", i))
        return {"kind": "shop", "i": i}

    def video_frame(self, i, frac, video_i=None):
        self.loaded.append(("frame", i))
        return {"kind": "frame", "i": i, "frac": frac}

    def consume_frame_draws(self, i, video_i=None):
        # rng-only fast-forward surface: must never count as a load
        pass

    # MultiDF2 surface
    def shop_view(self, p):
        self.loaded.append(("shop", p))
        return {"kind": "shop", "i": p}

    def street_view(self, p, frac):
        self.loaded.append(("street", p))
        return {"kind": "street", "i": p, "frac": frac}

    def consume_view_draws(self, p, tag):
        # rng-only fast-forward surface: must never count as a load
        pass


@pytest.mark.parametrize("which", ["movingfashion", "multidf2"])
@pytest.mark.parametrize("skip", [1, 3])
def test_sampler_skip_batches_replays_identically(which, skip):
    if which == "movingfashion":
        from seam_match_rcnn_tpu.data.movingfashion import product_batches
    else:
        from seam_match_rcnn_tpu.data.multidf2 import product_batches

    kw = dict(n_products=2, frames_per_product=3, seed=5, epoch=2,
              drop_last=True)
    full = list(product_batches(_FakeProductDataset(11), **kw))
    ds = _FakeProductDataset(11)
    resumed = list(product_batches(ds, skip_batches=skip, **kw))
    assert resumed == full[skip:]
    # fast-forward touched no images for the skipped batches
    skipped_ids = {it["i"] for b in full[:skip] for it in b}
    assert skipped_ids and not any(i in skipped_ids for _, i in ds.loaded)


def test_save_mid_repeated_large_payloads(tmp_path):
    """Regression: consecutive save_mid calls with multi-MB payloads.

    With a REUSED staging path, tensorstore's path-keyed OCDBT cache made
    the second save's commit reference the first save's renamed-away data
    files (NOT_FOUND in orbax's writer threads, silently-corrupt slot).
    Unique staging paths per save must survive this."""
    mgr = CheckpointManager(str(tmp_path), save_epochs=2)
    big = np.arange(1_600_000, dtype=np.float32)  # ~6.4 MB data file
    for step in range(3):
        mgr.save_mid({"state": {"w": big + step}, "epoch": 0,
                      "step_in_epoch": step,
                      "rng": np.asarray(jax.random.PRNGKey(step))})
    payload, is_mid = restore_training_checkpoint(
        mgr.latest(), {"state": {"w": big}, "epoch": 0})
    assert is_mid and int(payload["step_in_epoch"]) == 2
    np.testing.assert_array_equal(payload["state"]["w"], big + 2)


def test_epoch_save_supersedes_mid_slot(tmp_path):
    mgr = CheckpointManager(str(tmp_path), save_epochs=1)
    state = {"w": np.float32(1.0)}
    mgr.save_mid({"state": state, "epoch": 0, "step_in_epoch": 5})
    assert mgr.latest().endswith("mid")
    mgr.maybe_save(0, {"state": state, "epoch": 0})
    # the mid slot is cleared by the epoch-level save
    assert mgr.latest().endswith("epoch000")
    # a crash-leftover staging dir is never picked by latest()
    import os
    import shutil

    mgr.save_mid({"state": state, "epoch": 1, "step_in_epoch": 2})
    shutil.copytree(os.path.join(str(tmp_path), "mid"),
                    os.path.join(str(tmp_path), ".mid-123-0"))
    assert mgr.latest().endswith("mid")
    # ... and is swept together with the mid slot on an epoch-level save
    mgr.maybe_save(1, {"state": state, "epoch": 1})
    assert mgr.latest().endswith("epoch001")
    assert not any(e.startswith(".mid") for e in os.listdir(str(tmp_path)))


def test_resolve_auto_resume(tmp_path):
    from seam_match_rcnn_tpu.ckpt.io import resolve_auto_resume

    # nothing to resume: missing dir and empty dir both give None
    assert resolve_auto_resume(str(tmp_path), "tag") is None
    mgr = CheckpointManager(str(tmp_path / "tag"), save_epochs=1)
    assert resolve_auto_resume(str(tmp_path), "tag") is None
    state = {"w": np.float32(1.0)}
    mgr.maybe_save(0, {"state": state, "epoch": 0})
    assert resolve_auto_resume(str(tmp_path), "tag").endswith("epoch000")
    # the mid slot is newer than any epoch save
    mgr.save_mid({"state": state, "epoch": 1, "step_in_epoch": 0})
    assert resolve_auto_resume(str(tmp_path), "tag").endswith("mid")


def test_train_clis_accept_resume_flags():
    from seam_match_rcnn_tpu.cli import (train_matchrcnn, train_movingfashion,
                                         train_multidf2)

    for mod in (train_matchrcnn, train_movingfashion, train_multidf2):
        args = mod.build_argparser().parse_args(
            ["--auto_resume", "--save_steps", "50"])
        assert args.auto_resume and args.save_steps == 50
        assert mod.build_argparser().parse_args([]).save_steps == 0


def test_save_mid_roundtrip_and_detection(tmp_path):
    mgr = CheckpointManager(str(tmp_path), save_epochs=2)
    state = {"params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
             "opt": (np.float32(0.5), np.float32(2.0))}
    rng = np.asarray(jax.random.PRNGKey(3))
    path = mgr.save_mid({"state": state, "epoch": 4, "step_in_epoch": 17,
                         "rng": rng})
    payload, is_mid = restore_training_checkpoint(
        path, {"state": state, "epoch": 0})
    assert is_mid
    assert int(payload["epoch"]) == 4 and int(payload["step_in_epoch"]) == 17
    np.testing.assert_array_equal(payload["rng"], rng)
    # container types reimposed: the opt tuple stays a tuple
    assert isinstance(payload["state"]["opt"], tuple)
    np.testing.assert_array_equal(payload["state"]["params"]["w"],
                                  state["params"]["w"])

    # overwrite: second save_mid replaces the slot atomically
    mgr.save_mid({"state": state, "epoch": 4, "step_in_epoch": 19,
                  "rng": rng})
    payload2, _ = restore_training_checkpoint(
        path, {"state": state, "epoch": 0})
    assert int(payload2["step_in_epoch"]) == 19

    # mid payloads without an rng (phase-2 loops thread none) restore too
    mgr.save_mid({"state": state, "epoch": 1, "step_in_epoch": 3})
    payload_nr, is_mid_nr = restore_training_checkpoint(
        path, {"state": state, "epoch": 0})
    assert is_mid_nr and "rng" not in payload_nr
    assert int(payload_nr["step_in_epoch"]) == 3

    # epoch-level checkpoints are detected as NOT mid
    mgr.maybe_save(2, {"state": state, "epoch": 2})
    payload3, is_mid3 = restore_training_checkpoint(
        str(tmp_path / "epoch002"), {"state": state, "epoch": 0})
    assert not is_mid3 and int(payload3["epoch"]) == 2


def test_skip_batches_replays_dataset_rng_bitexact(tmp_path):
    """The fast-forward consumes the DATASET rng draws too (video choice,
    noise sigma, noise-field seed), so the surviving batches' decoded
    pixels are bit-identical to the uninterrupted run's."""
    import random

    from seam_match_rcnn_tpu.data.movingfashion import (
        MovingFashionDataset, product_batches)
    from seam_match_rcnn_tpu.data.synthetic import make_synthetic_movingfashion

    annots = make_synthetic_movingfashion(str(tmp_path), n_products=4,
                                          n_frames=6)
    kw = dict(n_products=2, frames_per_product=2, seed=3, epoch=1,
              drop_last=True)

    def run(skip):
        ds = MovingFashionDataset(annots, root=str(tmp_path), noise=True,
                                  rng=random.Random(11))
        return list(product_batches(ds, skip_batches=skip, **kw))

    full = run(0)
    resumed = run(1)
    assert len(resumed) == len(full) - 1
    for b_full, b_res in zip(full[1:], resumed):
        for it_full, it_res in zip(b_full, b_res):
            np.testing.assert_array_equal(it_full["image"], it_res["image"])
