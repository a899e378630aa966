"""Optimizer + LR schedules (optax).

Replicates the reference training recipe: SGD(momentum=0.9) with MultiStepLR
and a first-epoch linear warmup of 1/1000 → 1 over ≤1000 iterations
(/root/reference/train_matchrcnn.py:71-74, /root/reference/stuffs/engine.py:30-34,
/root/reference/stuffs/utils.py:442-449).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import optax


def multistep_warmup_schedule(
    base_lr: float,
    milestones: Sequence[int],
    gamma: float,
    steps_per_epoch: int,
    warmup_iters: int,
    warmup_factor: float,
):
    """step -> lr.  Warmup applies within epoch 0 only, like
    ``warmup_lr_scheduler`` driven from the epoch loop."""
    # clamp like the reference (min(1000, steps-1)); when that is <= 0
    # the reference lambda short-circuits `x >= warmup_iters -> 1`
    # (/root/reference/stuffs/utils.py:442-449), i.e. NO warmup for a
    # single-step epoch — flooring to 1 here would run that one step at
    # warmup_factor*lr (1000x too small)
    warmup_iters = min(warmup_iters, steps_per_epoch - 1)
    milestones_arr = jnp.asarray(list(milestones), dtype=jnp.int32)

    def schedule(step):
        epoch = step // steps_per_epoch
        decay = gamma ** jnp.sum(epoch >= milestones_arr)
        if warmup_iters <= 0:
            return base_lr * decay
        alpha = jnp.clip(step / warmup_iters, 0.0, 1.0)
        warm = jnp.where(
            epoch < 1, warmup_factor * (1 - alpha) + alpha, 1.0
        )
        return base_lr * decay * warm

    return schedule


def sgd(
    schedule,
    momentum: float = 0.9,
    weight_decay: float = 0.0,
    clip_grad_norm: float = 0.0,
) -> optax.GradientTransformation:
    """torch.optim.SGD semantics: wd added to the gradient, then heavyweight
    momentum (dampening 0), update = -lr * buf.

    ``clip_grad_norm`` > 0 prepends global-norm clipping — NOT reference
    behavior (off by default); needed for from-scratch training without an
    ImageNet backbone (TrainConfig.clip_grad_norm)."""
    parts = []
    if clip_grad_norm:
        parts.append(optax.clip_by_global_norm(clip_grad_norm))
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.trace(decay=momentum, nesterov=False))
    parts.append(optax.scale_by_learning_rate(schedule))
    return optax.chain(*parts)
