"""Phase-2 SEAM training: frozen detector inference feeding trainable heads.

Re-design of ``train_one_epoch_movingfashion`` / ``train_one_epoch_multiDF2``
(/root/reference/stuffs/engine.py:76-340).  The reference runs, per product
batch: ① a no-grad full-detector pass, ② host-side box selection, ③ a
trainable match-predictor/temporal-aggregator pass with weak losses.

TPU mapping:
  * ① is the jitted ``MatchRCNN.inference`` (roi features only) — the
    ``torch.no_grad`` chunked loop (engine.py:113-115) becomes plain batching.
  * ② stays on host (data-dependent shapes: score filter, shop
    largest-area box, product exclusion — engine.py:130-153) and emits
    fixed-size padded row arrays.
  * ③ is ONE jitted grad step over head params only: weak-label argmax
    selection runs in-graph (segment ops), the aggregator consumes a padded
    [P, T] winner grid, and gradients flow exactly like the reference's
    (label selection is non-differentiable argmax there too).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..losses.match import aggregation_loss, masked_pair_ce
from ..models.match_head import MatchPredictor, TemporalAggregator


class HeadState(NamedTuple):
    params: Any          # {'match_predictor': ..., 'temporal_aggregator': ...}
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def head_variables_from_model(variables) -> Tuple[Any, Any]:
    params = {k: variables["params"][k]
              for k in ("match_predictor", "temporal_aggregator")}
    stats = {k: variables["batch_stats"].get(k, {})
             for k in ("match_predictor", "temporal_aggregator")}
    return params, stats


def create_head_state(variables, tx) -> HeadState:
    params, stats = head_variables_from_model(variables)
    return HeadState(params, stats, tx.init(params), jnp.zeros((), jnp.int32))


def merge_head_state(variables, state: HeadState):
    """Write trained head params/stats back into the full variable tree."""
    params = dict(variables["params"])
    stats = dict(variables.get("batch_stats", {}))
    params.update(jax.tree.map(lambda x: x, state.params))
    stats.update(jax.tree.map(lambda x: x, state.batch_stats))
    return {"params": params, "batch_stats": stats}


@dataclasses.dataclass
class SelectedRows:
    """Host-side box selection output (engine.py:130-153), padded to K rows.

    Rows reference detections by (image, detection) index; the actual RoI
    features stay on device and are gathered inside the jitted head step.
    """

    row_img: np.ndarray       # [K] image index of each row
    row_det: np.ndarray       # [K] detection index within the image
    valid: np.ndarray         # [K]
    types: np.ndarray         # [K] 0 street / 1 shop
    prod: np.ndarray          # [K] product index in [0, P)
    img_slot: np.ndarray      # [K] street (product, frame) slot in [0, P*T)
    shop_row: np.ndarray      # [P] row of each product's shop box (-1 none)
    n_products: int
    frames_per_product: int


def select_rows_host(
    outputs: List[Dict[str, np.ndarray]],
    tags: List[int],
    prod_of_image: List[int],
    score_thresh: float,
    n_products: int,
    frames_per_product: int,
    max_rows: int,
) -> Optional[SelectedRows]:
    """engine.py:130-153: per image keep boxes with score >= thresh; a shop
    image keeps only its largest-area box; products whose shop has no box
    are dropped entirely.  Rows are packed into K=max_rows padded slots.

    outputs: per-image dicts with 'scores' [D], 'boxes' [D,4], 'valid' [D]
    (from the jitted inference; roi features stay on device).
    tags: 1 shop / 0 street per image; prod_of_image: product idx per image.
    """
    excluded = set()
    frame_counter: Dict[int, int] = {}
    rows = []  # (img, det, type, prod, img_slot)
    for i, (o, tag, p) in enumerate(zip(outputs, tags, prod_of_image)):
        if p in excluded:
            continue
        keep = np.nonzero((o["scores"] >= score_thresh) & o["valid"])[0]
        if keep.size < 1:
            if tag == 1:
                excluded.add(p)
            continue
        if tag == 1:
            b = o["boxes"][keep]
            areas = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
            keep = keep[[int(np.argmax(areas))]]
            slot = -1
        else:
            f = frame_counter.get(p, 0)
            frame_counter[p] = f + 1
            if f >= frames_per_product:
                continue
            slot = p * frames_per_product + f
        for j in keep:
            rows.append((i, int(j), tag, p, slot))

    # drop rows of retro-excluded products (street images seen before shop)
    rows = [r for r in rows if r[3] not in excluded]
    # truncate BEFORE the skip check: if every shop row falls past
    # max_rows, the step must be skipped (engine.py:153), not run with
    # all-masked losses (which would still advance the optimizer)
    rows = rows[:max_rows]
    types = np.asarray([r[2] for r in rows], np.int32)
    if len(rows) < 2 or not (types == 0).any() or not (types == 1).any():
        return None  # engine.py:153 skips the step

    k = max_rows
    row_img = np.zeros((k,), np.int32)
    row_det = np.zeros((k,), np.int32)
    valid = np.zeros((k,), bool)
    types_p = np.zeros((k,), np.int32)
    prod = np.zeros((k,), np.int32)
    img_slot = np.zeros((k,), np.int32)
    shop_row = np.full((n_products,), -1, np.int32)
    for r, (img, det, tag, p, slot) in enumerate(rows):
        row_img[r] = img
        row_det[r] = det
        valid[r] = True
        types_p[r] = tag
        prod[r] = p
        img_slot[r] = max(slot, 0)
        if tag == 1 and shop_row[p] < 0:
            shop_row[p] = r
    return SelectedRows(
        row_img=row_img, row_det=row_det, valid=valid, types=types_p,
        prod=prod, img_slot=img_slot, shop_row=shop_row,
        n_products=n_products, frames_per_product=frames_per_product,
    )


def _group_winners(score, grp, ok, num_groups):
    """Per-group argmax row (first on ties, like torch argmax) and validity."""
    n = score.shape[0]
    score = jnp.where(ok, score, -jnp.inf)
    g = jnp.where(ok, grp, num_groups)
    seg_max = jax.ops.segment_max(score, g, num_segments=num_groups + 1)
    rows = jnp.arange(n)
    is_max = ok & (score == seg_max[g])
    first = jax.ops.segment_min(jnp.where(is_max, rows, n), g, num_segments=num_groups + 1)
    winner = first[:num_groups]
    winner_valid = (winner < n) & jnp.isfinite(seg_max[:num_groups])
    return jnp.where(winner_valid, winner, 0), winner_valid, seg_max[:num_groups]


def build_weak_structures(
    logits: jnp.ndarray,
    valid: jnp.ndarray,
    types: jnp.ndarray,
    prod: jnp.ndarray,
    img_slot: jnp.ndarray,
    shop_row: jnp.ndarray,
    t_max: int,
    n_frames: int,
    match_threshold: float,
):
    """Weak-supervision structures shared by MatchLossWeak and the
    aggregation loss (match_head.py:210-246, 252-360): per street image the
    argmax-logit box vs its product's shop becomes the weak positive; per
    product the positive frames form the aggregation sequence (valid with
    >= n_frames winners and a shop box).

    logits: [K, P, 2] (stop-gradient'd for the selection).  Returns dict:
      gts [K, P] weak match labels; win_of_row [K]; seq_gather/seq_mask
      [P, T]; seq_ok [P]; ta_bn_valid [K] (rows the reference feeds to the
      aggregator's BatchNorm: winners + shops of valid products).

    Invalid groups carry winner index 0; all scatters redirect them out of
    range (mode="drop") so row 0 is never clobbered.
    """
    k_rows = logits.shape[0]
    p_count = shop_row.shape[0]
    shop_ok = shop_row >= 0
    shop_idx = jnp.maximum(shop_row, 0)

    street_ok = valid & (types == 0) & shop_ok[prod]
    score = jnp.take_along_axis(logits[..., 1], prod[:, None], axis=1)[:, 0]
    winner, winner_valid, seg_max = _group_winners(
        score, img_slot, street_ok, p_count * t_max
    )
    winner_pos = winner_valid & (seg_max > match_threshold)

    rows = jnp.arange(k_rows)
    win_rows = jnp.where(winner_pos, winner, k_rows)
    win_of_row = jnp.zeros((k_rows,), bool).at[win_rows].set(True, mode="drop")
    gts = jnp.zeros(logits.shape[:2], jnp.int32).at[rows, prod].set(
        win_of_row.astype(jnp.int32)
    )

    seq_gather = winner.reshape(p_count, t_max)
    seq_mask = winner_pos.reshape(p_count, t_max)
    seq_ok = (jnp.sum(seq_mask, axis=1) >= n_frames) & shop_ok

    shop_rows_ok = jnp.where(seq_ok & shop_ok, shop_idx, k_rows)
    ta_bn_valid = win_of_row | (
        jnp.zeros((k_rows,), bool).at[shop_rows_ok].set(True, mode="drop")
    )
    return {
        "gts": gts, "win_of_row": win_of_row, "seq_gather": seq_gather,
        "seq_mask": seq_mask, "seq_ok": seq_ok, "ta_bn_valid": ta_bn_valid,
    }


def make_seam_head_step(
    tx: optax.GradientTransformation,
    frames_per_product: int,
    n_frames: int = 3,
    match_threshold: float = -10.0,
):
    """MovingFashion head step (engine.py:120-198): MatchLossWeak +
    epoch-gated NEWBalancedAggregationMatchLossWeak."""
    mp = MatchPredictor()
    ta = TemporalAggregator(n_frames=n_frames)

    def loss_fn(params, batch_stats, batch):
        if "roi_src" in batch:
            # device-resident roi features: gather the selected (image,
            # detection) rows in-graph
            roi = batch["roi_src"][batch["row_img"], batch["row_det"]].astype(jnp.float32)
        else:
            roi = batch["roi_features"]
        valid = batch["valid"]
        types = batch["types"]
        prod = batch["prod"]
        img_slot = batch["img_slot"]
        shop_row = batch["shop_row"]
        p_count = shop_row.shape[0]
        t_max = frames_per_product

        shop_ok = shop_row >= 0
        shop_idx = jnp.maximum(shop_row, 0)

        # --- match predictor: descriptors + street x shop logits ---------
        mp_vars = {"params": params["match_predictor"],
                   "batch_stats": batch_stats["match_predictor"]}
        desc, mut_mp = mp.apply(
            mp_vars, roi, train=True, valid=valid,
            method=MatchPredictor.descriptors, mutable=["batch_stats"],
        )
        logits = mp.apply(
            mp_vars, desc, desc[shop_idx], method=MatchPredictor.score_pairs
        )  # [K, P, 2]

        ws = build_weak_structures(
            jax.lax.stop_gradient(logits), valid, types, prod, img_slot,
            shop_row, t_max, n_frames, match_threshold,
        )
        match_loss = masked_pair_ce(
            logits, ws["gts"],
            (valid & (types == 0))[:, None] & (valid & (types == 1))[shop_idx][None, :] & shop_ok[None, :],
        )

        # --- aggregation loss (match_head.py:252-360) --------------------
        seq_gather = ws["seq_gather"]
        seq_mask = ws["seq_mask"]
        seq_ok = ws["seq_ok"]
        ta_bn_valid = ws["ta_bn_valid"]
        ta_vars = {"params": params["temporal_aggregator"],
                   "batch_stats": batch_stats["temporal_aggregator"]}
        desc_a, mut_ta = ta.apply(
            ta_vars, roi, train=True, valid=ta_bn_valid,
            method=TemporalAggregator.descriptors, mutable=["batch_stats"],
        )
        seqs = desc_a[seq_gather] * seq_mask[..., None]
        agg = ta.apply(ta_vars, seqs, seq_mask, method=TemporalAggregator.aggregate)
        agg_logits = ta.apply(
            ta_vars, agg, desc_a[shop_idx], method=TemporalAggregator.score_pairs
        )  # [P, P, 2]
        agg_gts = jnp.eye(p_count, dtype=jnp.int32)
        agg_l = aggregation_loss(agg_logits, agg_gts, seq_ok, seq_ok)

        total = match_loss + batch["aggr_weight"] * agg_l
        new_stats = {"match_predictor": mut_mp["batch_stats"],
                     "temporal_aggregator": mut_ta["batch_stats"]}
        return total, ({"match_loss": match_loss, "aggregation_loss": agg_l},
                       new_stats)

    @jax.jit
    def step(state: HeadState, batch):
        (total, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, batch)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        losses = dict(losses, loss=total)
        return HeadState(new_params, new_stats, opt_state, state.step + 1), losses

    return step


def make_mdf2_head_step(tx: optax.GradientTransformation, n_frames: int = 3):
    """MultiDF2 head step (engine.py:202-340): only the temporal aggregator
    trains (match_predictor stays in eval, engine.py:244-245); loss =
    AggregationMatchLossDF2 with host-provided GT-IoU product assignment.

    batch extras: seq_gather [P, T], seq_mask [P, T] (rows grouped per
    product on host), shop_row [P].
    """
    ta = TemporalAggregator(n_frames=n_frames)

    def loss_fn(ta_params, batch_stats, batch):
        if "roi_src" in batch:
            roi = batch["roi_src"][batch["row_img"], batch["row_det"]].astype(jnp.float32)
        else:
            roi = batch["roi_features"]
        shop_row = batch["shop_row"]
        shop_ok = shop_row >= 0
        shop_idx = jnp.maximum(shop_row, 0)
        seq_gather = batch["seq_gather"]
        seq_mask = batch["seq_mask"]
        # AggregationMatchLossDF2 requires >= 3 street views (match_head.py:406)
        seq_ok = jnp.sum(seq_mask, axis=1) >= 3

        k_rows = roi.shape[0]
        seq_rows = jnp.where(seq_mask.reshape(-1), seq_gather.reshape(-1), k_rows)
        used = jnp.zeros((k_rows,), bool).at[seq_rows].set(True, mode="drop")
        shop_rows = jnp.where(shop_ok, shop_idx, k_rows)
        used = used | jnp.zeros((k_rows,), bool).at[shop_rows].set(True, mode="drop")

        ta_vars = {"params": ta_params, "batch_stats": batch_stats["temporal_aggregator"]}
        desc_a, mut_ta = ta.apply(
            ta_vars, roi, train=True, valid=used,
            method=TemporalAggregator.descriptors, mutable=["batch_stats"],
        )
        seqs = desc_a[seq_gather] * seq_mask[..., None]
        agg = ta.apply(ta_vars, seqs, seq_mask, method=TemporalAggregator.aggregate)
        agg_logits = ta.apply(
            ta_vars, agg, desc_a[shop_idx], method=TemporalAggregator.score_pairs
        )
        gts = jnp.eye(seq_gather.shape[0], dtype=jnp.int32)
        loss = aggregation_loss(agg_logits, gts, seq_ok, shop_ok)
        stats = dict(batch_stats, temporal_aggregator=mut_ta["batch_stats"])
        return loss, ({"aggregation_loss": loss}, stats)

    @jax.jit
    def step(state: HeadState, batch):
        (total, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params["temporal_aggregator"], state.batch_stats, batch)
        grads_full = {"match_predictor": jax.tree.map(jnp.zeros_like, state.params["match_predictor"]),
                      "temporal_aggregator": grads}
        updates, opt_state = tx.update(grads_full, state.opt_state, state.params)
        # Zero the frozen subtree's UPDATES too: sgd()'s add_decayed_weights
        # injects wd*w past the zeroed grads, which would decay the frozen
        # match predictor every step — torch SGD leaves grad-less params
        # untouched (reference trains only the aggregator here,
        # /root/reference/stuffs/engine.py:244-245).
        updates = dict(updates, match_predictor=jax.tree.map(
            jnp.zeros_like, updates["match_predictor"]))
        new_params = optax.apply_updates(state.params, updates)
        losses = dict(losses, loss=total)
        return HeadState(new_params, new_stats, opt_state, state.step + 1), losses

    return step
