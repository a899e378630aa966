"""Checkpoint save/restore (Orbax).

Replaces the reference's ``torch.save({epoch, model_state_dict,
optimizer_state_dict, scheduler_state_dict})`` every N epochs
(/root/reference/train_matchrcnn.py:90-105, train_movingfashion.py:124-151).
Checkpoints carry the full variable tree, optimizer state and epoch; resume
restores all three (``--start_ckpt`` semantics,
train_movingfashion.py:79-83).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def save_checkpoint(path: str, payload: Dict[str, Any]):
    """payload: e.g. {'variables': ..., 'opt_state': ..., 'epoch': int}."""
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, jax.tree.map(np.asarray, payload), force=True)


def restore_checkpoint(path: str, target: Any = None) -> Dict[str, Any]:
    """``target``: optional pytree with the desired STRUCTURE (e.g. a
    TrainState._asdict()).  Without it orbax returns raw nested dicts/lists,
    which breaks consumers expecting typed nodes — optax opt_states are
    NamedTuples whose update path uses attribute access.  (The CLI
    ``--start_ckpt`` resume flow goes through
    ``restore_training_checkpoint``, which re-imposes types by name.)"""
    ckptr = ocp.PyTreeCheckpointer()
    path = os.path.abspath(path)
    if target is None:
        return ckptr.restore(path)

    def _skeleton(x):
        # structure/dtype metadata only — np.asarray on a live device
        # TrainState would pull every parameter to host (~1 MB/s here,
        # CLAUDE.md) just to describe the tree
        if hasattr(x, "shape") and hasattr(x, "dtype"):
            return np.empty(x.shape, x.dtype)
        return x

    restored = ckptr.restore(path, item=jax.tree.map(_skeleton, target))
    if jax.tree.structure(restored) == jax.tree.structure(target):
        return restored
    # Orbax returned plain containers (dicts/lists) where the target holds
    # typed nodes.  Re-impose the target's types by NAME, never by flat
    # leaf order: dict leaves flatten key-sorted, so a blind unflatten
    # would silently permute NamedTuple fields whose declaration order is
    # not alphabetical — corrupting opt_state with no error (ADVICE r1).
    return _reimpose_types(target, restored)


def _reimpose_types(target: Any, restored: Any) -> Any:
    """Recursively rebuild ``restored`` with ``target``'s container types,
    matching NamedTuple fields / dict entries by name and sequences by
    position; raises KeyError/ValueError loudly on a genuine mismatch."""
    if isinstance(target, tuple) and hasattr(target, "_fields"):  # NamedTuple
        if isinstance(restored, dict):
            children = [_reimpose_types(getattr(target, f), restored[f])
                        for f in target._fields]
        else:
            if len(restored) != len(target._fields):
                raise ValueError(
                    f"checkpoint node has {len(restored)} children but "
                    f"target {type(target).__name__} expects "
                    f"{target._fields}")
            children = [_reimpose_types(getattr(target, f), r)
                        for f, r in zip(target._fields, restored)]
        return type(target)(*children)
    if isinstance(target, dict):
        if not isinstance(restored, dict):
            raise ValueError(
                f"checkpoint node {type(restored).__name__} where target "
                f"expects a dict with keys {sorted(target)}")
        return {k: _reimpose_types(v, restored[k]) for k, v in target.items()}
    if isinstance(target, (list, tuple)):
        if isinstance(restored, dict):
            # orbax's plain-container form for sequences is {'0': ..,
            # '1': ..}; zipping the dict directly would iterate its KEYS
            # and silently replace every leaf with a string
            restored = [restored[str(i)] for i in range(len(target))]
        if not isinstance(restored, (list, tuple)):
            raise ValueError(
                f"checkpoint node {type(restored).__name__} where target "
                f"expects a sequence of {len(target)}")
        if len(restored) != len(target):
            raise ValueError(
                f"checkpoint node has {len(restored)} children but target "
                f"{type(target).__name__} has {len(target)}")
        return type(target)(
            _reimpose_types(t, r) for t, r in zip(target, restored))
    return restored  # leaf (array / scalar / None)


def restore_training_checkpoint(path: str, target: Dict[str, Any]):
    """Restore an epoch-level or mid-epoch training checkpoint.

    ``target`` is the epoch-level payload structure (e.g. ``{"state":
    TrainState._asdict(), "epoch": 0}``); restored state keeps its
    container types (NamedTuple opt_state chains survive).  Returns
    ``(payload, is_mid)``: ``is_mid`` is True when the checkpoint was
    written by ``CheckpointManager.save_mid`` — the payload then also has
    ``step_in_epoch`` (and ``rng`` for loops that thread one)."""
    raw = restore_checkpoint(path)
    is_mid = "step_in_epoch" in raw
    tgt: Dict[str, Any] = dict(target)
    if is_mid:
        tgt.setdefault("step_in_epoch", 0)
        if "rng" in raw:
            tgt.setdefault("rng", raw["rng"])
    return _reimpose_types(tgt, raw), is_mid


def resolve_auto_resume(save_dir: str, save_tag: str) -> Optional[str]:
    """``--auto_resume`` support: newest checkpoint (mid-epoch slot
    included) under ``save_dir/save_tag``, or None when there is nothing
    to resume from.  Lets a preempted job restart with its original
    command line + one flag instead of hand-picking a ``--start_ckpt``
    path (no reference equivalent: resume there is always manual,
    /root/reference/train_movingfashion.py:79-83)."""
    directory = os.path.join(save_dir, save_tag)
    if not os.path.isdir(directory):
        return None
    return CheckpointManager(directory).latest()


class CheckpointManager:
    """Rank-0-style periodic saver (reference saves every ``save_epochs``
    plus a final one)."""

    def __init__(self, directory: str, save_epochs: int = 2):
        self.directory = directory
        self.save_epochs = save_epochs
        os.makedirs(directory, exist_ok=True)

    def maybe_save(self, epoch: int, payload: Dict[str, Any], final: bool = False):
        # save_epochs 0 = periodic saves off (only `final`), not a crash
        if final or (self.save_epochs > 0 and epoch % self.save_epochs == 0):
            name = f"epoch{epoch:03d}" if not final else "final"
            save_checkpoint(os.path.join(self.directory, name), payload)
            self._clear_mid()

    def _clear_mid(self):
        """An epoch-level save supersedes the mid slot — drop it (and any
        crash-leftover staging dirs) so ``latest()`` never resumes from a
        stale mid-epoch snapshot."""
        import shutil

        for name in os.listdir(self.directory):
            # substring, not endswith: orbax names staging dirs either
            # <name>.orbax-checkpoint-tmp or — depending on the API path —
            # <name>.orbax-checkpoint-tmp-<timestamp>
            # (orbax _src/path/temporary_paths.py)
            if name == "mid" or name.startswith(".mid-") \
                    or ".orbax-checkpoint-tmp" in name:
                p = os.path.join(self.directory, name)
                if os.path.isdir(p):
                    shutil.rmtree(p)

    def save_mid(self, payload: Dict[str, Any]) -> str:
        """Overwriting mid-epoch slot for preemption-safe resume (no
        reference equivalent — torch.save only runs between epochs,
        /root/reference/train_matchrcnn.py:90-105).  Written to a
        ``.mid-<pid>-<n>`` staging dir first, then swapped in: a kill
        during the write leaves the previous ``mid`` intact; a kill
        between the rmtree and the rename leaves a complete staging dir
        to recover from.

        The staging path is UNIQUE per save: tensorstore's process-wide
        OCDBT cache is keyed by path, so reusing one tmp dir makes the
        second save's commit reference the first save's (renamed-away)
        data files and fail NOT_FOUND in orbax's writer threads — caught
        live by the kill-and-resume CLI drive."""
        import shutil

        self._mid_seq = getattr(self, "_mid_seq", -1) + 1
        tmp = os.path.join(self.directory,
                           f".mid-{os.getpid()}-{self._mid_seq}")
        dst = os.path.join(self.directory, "mid")
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)
        save_checkpoint(tmp, payload)
        if os.path.isdir(dst):
            shutil.rmtree(dst)
        os.rename(tmp, dst)
        return dst

    def latest(self) -> Optional[str]:
        """Newest checkpoint dir, by modification time (name tiebreak).

        NOT alphabetical: a completed run leaves a ``final`` slot which
        sorts after every ``epochNNN``, so a relaunch with more epochs
        (``--auto_resume``) that then gets preempted must resume from the
        newest epoch save, not the stale ``final``.  ``mid`` only survives
        until the next epoch-level save (``_clear_mid``), so by mtime it
        is correctly preferred while it exists.  A crash-leftover
        ``.mid-*`` staging dir is complete (written before the swap) but
        never considered."""
        entries = sorted(
            (e for e in os.listdir(self.directory)
             if os.path.isdir(os.path.join(self.directory, e))
             and not e.startswith(".")
             # substring: staging dirs may be suffixed with a timestamp
             # (<name>.orbax-checkpoint-tmp-<ts>) — never resume from one
             and ".orbax-checkpoint-tmp" not in e),
            key=lambda e: (os.path.getmtime(os.path.join(self.directory, e)),
                           e),
        )
        return os.path.join(self.directory, entries[-1]) if entries else None
