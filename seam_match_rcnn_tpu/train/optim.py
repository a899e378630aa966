"""Optimizer + LR schedules (optax).

Replicates the reference training recipe: SGD(momentum=0.9) with MultiStepLR
and a first-epoch linear warmup of 1/1000 → 1 over ≤1000 iterations
(/root/reference/train_matchrcnn.py:71-74, /root/reference/stuffs/engine.py:30-34,
/root/reference/stuffs/utils.py:442-449).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import optax


def backbone_frozen_mask(params):
    """Trainability mask (True = trainable) replicating what the reference
    optimizer never updates (/root/reference/train_matchrcnn.py:70 filters on
    ``requires_grad``):

    - torchvision ``resnet_fpn_backbone('resnet50', ...)`` defaults to
      ``trainable_layers=3``, which sets ``requires_grad=False`` on the stem
      (conv1 + bn1) and layer1 (/root/reference/models/matchrcnn.py:486);
    - every ``FrozenBatchNorm2d`` affine is a torch *buffer*, not a
      parameter, so no BN scale/shift anywhere in the backbone body is ever
      optimized.

    Wrap the optimizer with ``optax.masked(tx, backbone_frozen_mask)`` so the
    frozen leaves get zero updates AND no momentum/weight-decay state —
    matching params that are simply absent from ``torch.optim.SGD``.
    """
    bn_names = ("bn1", "bn2", "bn3", "downsample_bn")

    def trainable(path, _):
        keys = [getattr(p, "key", None) for p in path]
        if len(keys) >= 2 and keys[0] == "backbone" and keys[1] == "body":
            mod = keys[2] if len(keys) > 2 else ""
            if mod in ("conv1", "bn1") or mod.startswith("layer1_"):
                return False
            if any(k in bn_names for k in keys[2:]):
                return False
        return True

    return jax.tree_util.tree_map_with_path(trainable, params)


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
    trainable_mask=None,
) -> optax.GradientTransformation:
    """torch.optim.SGD semantics: wd added to the gradient, then heavyweight
    momentum (dampening 0), update = -lr * buf.

    ``clip_grad_norm`` > 0 prepends global-norm clipping — NOT reference
    behavior (off by default); needed for from-scratch training without an
    ImageNet backbone (TrainConfig.clip_grad_norm).

    ``trainable_mask`` (pytree of bool matching params, or callable
    params -> mask) excludes leaves from the whole chain — zero update, no
    momentum/wd state, and no contribution to the clip norm — exactly like
    params filtered out of ``torch.optim.SGD`` by ``requires_grad``
    (see backbone_frozen_mask).  NOTE: implemented with multi_transform +
    set_to_zero, NOT optax.masked(tx, mask) — masked passes the masked-OUT
    leaves' updates through *unchanged* (raw gradients would be applied)."""
    parts = []
    if clip_grad_norm:
        parts.append(optax.clip_by_global_norm(clip_grad_norm))
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.trace(decay=momentum, nesterov=False))
    parts.append(optax.scale_by_learning_rate(schedule))
    tx = optax.chain(*parts)
    if trainable_mask is not None:
        def labels(tree):
            mask = (trainable_mask(tree) if callable(trainable_mask)
                    else trainable_mask)
            return jax.tree.map(lambda t: "train" if t else "freeze", mask)

        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()}, labels)
    return tx
