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


def make_phase1_step(model: MatchRCNN, tx: optax.GradientTransformation):
    """Returns step(state, batch, rng) -> (state, loss_dict).

    batch: images [B,H,W,3], sizes [B,2], gt dict (see
    MatchRCNN.training_losses).
    """

    def loss_fn(params, batch_stats, batch, rng):
        variables = {"params": params, "batch_stats": batch_stats}
        losses, mut = model.apply(
            variables, batch["images"], batch["sizes"], batch["gt"], rng,
            method=MatchRCNN.training_losses, mutable=["batch_stats"],
        )
        total = sum(losses.values())
        return total, (losses, mut["batch_stats"])

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
