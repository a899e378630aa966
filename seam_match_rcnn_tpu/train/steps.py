"""Jitted train steps.

Phase-1 (supervised Match R-CNN, reference
/root/reference/stuffs/engine.py:18-71): one jit-compiled step does the full
forward, every loss, backward, and the SGD update.  Under a data-sharded
mesh the scalar loss spans the global batch, so XLA inserts the gradient
all-reduce — fixing the reference's missing DDP synchronization
(SURVEY.md §2.4).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models.matchrcnn import MatchRCNN


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def create_train_state(variables, tx: optax.GradientTransformation) -> TrainState:
    params = variables["params"]
    return TrainState(
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def _phase1_loss_fn(model: MatchRCNN):
    """Shared phase-1 loss closure: ONE definition so the plain step and
    the grad-accumulation triple can never silently diverge."""

    def loss_fn(params, batch_stats, batch, rng):
        variables = {"params": params, "batch_stats": batch_stats}
        losses, mut = model.apply(
            variables, batch["images"], batch["sizes"], batch["gt"], rng,
            method=MatchRCNN.training_losses, mutable=["batch_stats"],
        )
        total = sum(losses.values())
        return total, (losses, mut["batch_stats"])

    return loss_fn


def make_phase1_step(model: MatchRCNN, tx: optax.GradientTransformation):
    """Returns step(state, batch, rng) -> (state, loss_dict).

    batch: images [B,H,W,3], sizes [B,2], gt dict (see
    MatchRCNN.training_losses).
    """
    loss_fn = _phase1_loss_fn(model)

    @jax.jit
    def step(state: TrainState, batch, rng) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        (total, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        losses = dict(losses, loss=total)
        return (
            TrainState(params, new_stats, opt_state, state.step + 1),
            losses,
        )

    return step


def make_phase1_grad_apply(model: MatchRCNN, tx: optax.GradientTransformation):
    """Gradient-accumulation variant of make_phase1_step for mixed-orientation
    batches: the static dual-canvas design splits a batch into per-orientation
    buckets, but the reference performs ONE optimizer update per batch
    (/root/reference/stuffs/engine.py:62-64) — so bucket gradients must be
    accumulated (weighted by bucket fraction) and applied once, or the
    effective batch size silently shrinks to the bucket size (VERDICT r1
    weak #5).

    Returns (grad_fn, accum_fn, apply_fn):
      grad_fn(state, batch, rng, weight) -> (grads*weight, losses, new_stats)
      accum_fn(acc, grads) -> acc + grads
      apply_fn(state, grads, new_stats) -> state  (one tx.update)

    ``weight`` should be n_bucket/n_batch: the per-image losses normalize by
    fixed per-image sample counts (256 RPN anchors, 512 rois), so the
    weighted sum of bucket means equals the full-batch mean for those terms;
    the match loss normalizes by its valid-pair count, where the weighting
    is per-image rather than per-pair (documented deviation, same direction
    as the reference's own per-batch pair-count normalization).
    """
    loss_fn = _phase1_loss_fn(model)

    @jax.jit
    def grad_fn(state: TrainState, batch, rng, weight):
        (total, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, batch, rng)
        grads = jax.tree.map(lambda g: g * weight, grads)
        losses = dict(losses, loss=total)
        return grads, losses, new_stats

    @jax.jit
    def accum_fn(acc, grads):
        return jax.tree.map(jnp.add, acc, grads)

    @jax.jit
    def apply_fn(state: TrainState, grads, new_stats) -> TrainState:
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, new_stats, opt_state, state.step + 1)

    return grad_fn, accum_fn, apply_fn
