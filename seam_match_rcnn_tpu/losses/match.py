"""Match losses — the reference's six variants, padded/masked.

Reference: /root/reference/models/match_head.py
  * MatchLossPreTrained (:466-504)  — phase-1 supervised CE over
    street×shop grids keyed by (pair_id, style), style≠0, with the
    loss>1 ⇒ loss/2 damping (:500-501, behaviour, kept).
  * MatchLoss (:172-207)            — same minus the style≠0 requirement.
  * MatchLossWeak (:210-246)        — weak video supervision: per street
    image the argmax-logit box vs its product's shop goes positive if above
    match_threshold.
  * NEWBalancedAggregationMatchLossWeak (:252-360) — aggregator CE with
    class weights [1.0, 0.3]; the candidate/group construction is
    data-dependent and runs on host (train/seam.py), the loss here.
  * MatchLossDF2 (:363-379)         — CE on street×shop grid from product ids.
  * AggregationMatchLossDF2 (:382-438) — aggregator CE for MultiDF2.

All grids carry a pair-validity mask; means are over valid pairs which
equals the reference's dynamic-shape means.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .detection import softmax_ce


def masked_pair_ce(
    logits: jnp.ndarray,
    gts: jnp.ndarray,
    pair_valid: jnp.ndarray,
    class_weights: Tuple[float, float] = (1.0, 1.0),
) -> jnp.ndarray:
    """Cross entropy over an [N, M, 2] pair grid.

    torch's weighted CE mean divides by the summed weights of the targets.
    """
    ce = softmax_ce(logits, gts)
    w = jnp.where(gts == 1, class_weights[1], class_weights[0])
    w = jnp.where(pair_valid, w, 0.0)
    return jnp.sum(ce * w) / jnp.maximum(jnp.sum(w), 1e-8)


def _damp(loss: jnp.ndarray) -> jnp.ndarray:
    """The reference's ad-hoc damping: loss > 1 ⇒ loss / 2
    (match_head.py:500-501)."""
    return jnp.where(loss > 1.0, loss / 2.0, loss)


def match_loss_supervised(
    logits: jnp.ndarray,
    street_pairs: jnp.ndarray,
    street_styles: jnp.ndarray,
    shop_pairs: jnp.ndarray,
    shop_styles: jnp.ndarray,
    street_valid: jnp.ndarray,
    shop_valid: jnp.ndarray,
    require_nonzero_style: bool = True,
) -> jnp.ndarray:
    """MatchLossPreTrained (require_nonzero_style=True) / MatchLoss (False).

    logits: [N, M, 2]; street_* [N]; shop_* [M].
    """
    same = (street_pairs[:, None] == shop_pairs[None, :]) & (
        street_styles[:, None] == shop_styles[None, :]
    )
    if require_nonzero_style:
        same &= (street_styles[:, None] != 0) & (shop_styles[None, :] != 0)
    gts = same.astype(jnp.int32)
    valid = street_valid[:, None] & shop_valid[None, :]
    return _damp(masked_pair_ce(logits, gts, valid))


def weak_match_labels(
    logits: jnp.ndarray,
    street_img: jnp.ndarray,
    street_shop_col: jnp.ndarray,
    street_valid: jnp.ndarray,
    num_images: int,
    match_threshold: float = -10.0,
) -> jnp.ndarray:
    """MatchLossWeak label construction (match_head.py:227-241): within each
    street image, the box with the max logit vs its product's shop column is
    positive iff that max exceeds match_threshold.

    logits: [N, M, 2]; street_img: [N] image group id in [0, num_images);
    street_shop_col: [N] shop column of the row's product (-1 if none).

    Returns gts [N, M] int32.
    """
    n, m = logits.shape[:2]
    col = jnp.maximum(street_shop_col, 0)
    score = jnp.take_along_axis(logits[..., 1], col[:, None], axis=1)[:, 0]
    ok = street_valid & (street_shop_col >= 0)
    score = jnp.where(ok, score, -jnp.inf)
    grp = jnp.where(ok, street_img, num_images)
    seg_max = jax.ops.segment_max(score, grp, num_segments=num_images + 1)
    # first row achieving the group max (ties broken like torch argmax)
    is_max = score == seg_max[grp]
    rows = jnp.arange(n)
    first = jax.ops.segment_min(
        jnp.where(is_max, rows, n), grp, num_segments=num_images + 1
    )
    winner = ok & (rows == first[grp]) & (score > match_threshold)
    gts = jnp.zeros((n, m), jnp.int32)
    return gts.at[rows, col].set(winner.astype(jnp.int32))


def match_loss_weak(
    logits: jnp.ndarray,
    gts: jnp.ndarray,
    street_valid: jnp.ndarray,
    shop_valid: jnp.ndarray,
) -> jnp.ndarray:
    valid = street_valid[:, None] & shop_valid[None, :]
    return masked_pair_ce(logits, gts, valid, class_weights=(1.0, 1.0))


def aggregation_loss(
    agg_logits: jnp.ndarray,
    gts: jnp.ndarray,
    seq_valid: jnp.ndarray,
    shop_valid: jnp.ndarray,
) -> jnp.ndarray:
    """Aggregator CE with class weights [1.0, 0.3] (match_head.py:256,386)."""
    valid = seq_valid[:, None] & shop_valid[None, :]
    return masked_pair_ce(agg_logits, gts, valid, class_weights=(1.0, 0.3))


def match_loss_df2(
    logits: jnp.ndarray,
    street_prods: jnp.ndarray,
    shop_prods: jnp.ndarray,
    street_valid: jnp.ndarray,
    shop_valid: jnp.ndarray,
) -> jnp.ndarray:
    """MatchLossDF2: positives where detection product ids agree."""
    gts = (street_prods[:, None] == shop_prods[None, :]).astype(jnp.int32)
    valid = street_valid[:, None] & shop_valid[None, :]
    return masked_pair_ce(logits, gts, valid, class_weights=(1.0, 1.0))
