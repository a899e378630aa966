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
    """``target``: optional pytree with the desired STRUCTURE (e.g. a live
    TrainState._asdict()).  Without it orbax returns raw nested dicts/lists,
    which breaks consumers expecting typed nodes — optax opt_states are
    NamedTuples whose update path uses attribute access, so the --start_ckpt
    resume flow must pass the structure it is restoring into."""
    ckptr = ocp.PyTreeCheckpointer()
    path = os.path.abspath(path)
    if target is None:
        return ckptr.restore(path)
    restored = ckptr.restore(path, item=jax.tree.map(np.asarray, target))
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
        if len(restored) != len(target):
            raise ValueError(
                f"checkpoint node has {len(restored)} children but target "
                f"{type(target).__name__} has {len(target)}")
        return type(target)(
            _reimpose_types(t, r) for t, r in zip(target, restored))
    return restored  # leaf (array / scalar / None)


class CheckpointManager:
    """Rank-0-style periodic saver (reference saves every ``save_epochs``
    plus a final one)."""

    def __init__(self, directory: str, save_epochs: int = 2):
        self.directory = directory
        self.save_epochs = save_epochs
        os.makedirs(directory, exist_ok=True)

    def maybe_save(self, epoch: int, payload: Dict[str, Any], final: bool = False):
        if final or (epoch % self.save_epochs == 0):
            name = f"epoch{epoch:03d}" if not final else "final"
            save_checkpoint(os.path.join(self.directory, name), payload)

    def latest(self) -> Optional[str]:
        entries = sorted(
            e for e in os.listdir(self.directory)
            if os.path.isdir(os.path.join(self.directory, e))
        )
        return os.path.join(self.directory, entries[-1]) if entries else None
