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


class Phase1Trainer:
    """Phase-1 step with EXACT fused-batch semantics for mixed-orientation
    batches (the production path; replaces the per-image-weighted
    accumulation triple's two documented deviations).

    The reference trains the WHOLE mixed batch in one dynamic-shape forward
    (/root/reference/stuffs/engine.py:42-64): its cls/box/mask normalizers
    span the batch, and its match loss pairs street and shop slots ACROSS
    images — including pairs whose two images land in different static
    canvases here.  Bucket-weighted accumulation loses both: normalizers
    become per-bucket, and cross-bucket street-shop pairs vanish from the
    match loss entirely.

    Exact scheme (one optimizer update per batch, reference semantics):
      1. ``export`` per bucket (forward-only): unnormalized detector loss
         parts + the match-slot RoIs [B_b*k, 14, 14, C] with pair metadata.
      2. ``match_grad`` once over the CONCATENATED RoIs: global match loss
         (its BN trains over the full slot set, per-pair normalization,
         cross-bucket pairs intact) + cotangents d(loss)/d(rois) and the
         match-predictor param grads.
      3. ``linked_grad`` per bucket (rematerialized backward): gradient of
         [global-scale · detector-loss parts + <rois, g_rois_bucket>] —
         pulling the match cotangent back through each bucket's detector.
      4. merge + ONE tx.update.
    Cost: one extra detector forward per bucket vs the fused single-bucket
    step; single-orientation batches take the fused path (no overhead).
    """

    def __init__(self, model: MatchRCNN, tx: optax.GradientTransformation):
        self.model, self.tx = model, tx
        self.grad_fn, self.accum_fn, self.apply_fn = make_phase1_grad_apply(
            model, tx)

        @jax.jit
        def export_fn(state: TrainState, batch, rng):
            variables = {"params": state.params,
                         "batch_stats": state.batch_stats}
            return model.apply(
                variables, batch["images"], batch["sizes"], batch["gt"],
                rng, method=MatchRCNN.train_export)

        @jax.jit
        def match_grad_fn(mp_params, mp_stats, rois, meta):
            def f(p, r):
                loss, mut = model.apply(
                    {"params": {"match_predictor": p},
                     "batch_stats": {"match_predictor": mp_stats}},
                    r, meta, method=MatchRCNN.match_loss_from_rois,
                    mutable=["batch_stats"],
                )
                return loss, mut["batch_stats"]["match_predictor"]

            (loss, new_stats), (g_mp, g_rois) = jax.value_and_grad(
                f, argnums=(0, 1), has_aux=True)(mp_params, rois)
            return loss, g_mp, g_rois, new_stats

        @jax.jit
        def linked_grad_fn(state: TrainState, batch, rng, scales, g_rois):
            def loss_fn(params):
                parts, rois, _ = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    batch["images"], batch["sizes"], batch["gt"], rng,
                    method=MatchRCNN.train_export)
                tot = (
                    scales["img"] * (parts["obj_sum"] + parts["rpn_box_sum"])
                    + scales["samp"] * (parts["cls_sum"] + parts["box_sum"])
                    + scales["mask"] * parts["mask_sum"]
                    + jnp.vdot(rois, g_rois)
                )
                return tot, parts

            return jax.grad(loss_fn, has_aux=True)(state.params)

        @jax.jit
        def merge_apply_fn(state: TrainState, acc, g_mp, new_mp_stats
                           ) -> TrainState:
            acc = dict(acc, match_predictor=jax.tree.map(
                jnp.add, acc["match_predictor"], g_mp))
            updates, opt_state = tx.update(acc, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            stats = dict(state.batch_stats, match_predictor=new_mp_stats)
            return TrainState(params, stats, opt_state, state.step + 1)

        self.export_fn = export_fn
        self.match_grad_fn = match_grad_fn
        self.linked_grad_fn = linked_grad_fn
        self.merge_apply_fn = merge_apply_fn

    def step(self, state: TrainState, batches, rngs
             ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        """batches: one batch dict per canvas bucket; rngs: one key per
        bucket (engine splits them in data order for resume replay)."""
        if len(batches) == 1:  # fused path IS the exact semantics
            grads, losses, stats = self.grad_fn(
                state, batches[0], rngs[0], jnp.float32(1.0))
            return self.apply_fn(state, grads, stats), losses

        exports = [self.export_fn(state, b, r)
                   for b, r in zip(batches, rngs)]
        parts_tot = jax.tree.map(
            lambda *xs: sum(xs), *[e[0] for e in exports])
        rois = jnp.concatenate([e[1] for e in exports], axis=0)
        meta = {k: jnp.concatenate([e[2][k] for e in exports], axis=0)
                for k in exports[0][2]}
        loss_match, g_mp, g_rois, new_mp_stats = self.match_grad_fn(
            state.params["match_predictor"],
            state.batch_stats["match_predictor"], rois, meta)

        n_images = sum(b["images"].shape[0] for b in batches)
        one = jnp.float32(1.0)
        scales = {
            "img": one / n_images,
            "samp": one / jnp.maximum(parts_tot["samp_n"], 1),
            "mask": one / (jnp.maximum(parts_tot["mask_n"], 1) * (28 * 28)),
        }
        acc = None
        off = 0
        for b, r, e in zip(batches, rngs, exports):
            n_b = e[1].shape[0]
            grads, _ = self.linked_grad_fn(
                state, b, r, scales, g_rois[off:off + n_b])
            off += n_b
            acc = grads if acc is None else self.accum_fn(acc, grads)
        state = self.merge_apply_fn(state, acc, g_mp, new_mp_stats)
        losses = MatchRCNN.det_losses_from_parts(parts_tot, n_images)
        losses["loss_match"] = loss_match
        losses["loss"] = sum(losses.values())
        return state, losses
