"""Proposal↔GT matching and balanced fg/bg sampling, static-shape.

TPU-native equivalents of torchvision's ``Matcher`` and
``BalancedPositiveNegativeSampler`` which the reference RoI heads / RPN hold
references to (/root/reference/models/matchrcnn.py:62-63,96-128).  Dynamic
``nonzero``-style selection is replaced by random-priority top-k so every
shape is static; selections are accompanied by validity masks.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

BELOW_LOW_THRESHOLD = -1
BETWEEN_THRESHOLDS = -2


def match_proposals(
    quality: jnp.ndarray,
    gt_valid: jnp.ndarray,
    high_threshold: float,
    low_threshold: float,
    allow_low_quality: bool = False,
) -> jnp.ndarray:
    """torchvision ``Matcher.__call__``.

    Args:
      quality: [G, N] match quality (IoU) of padded gts vs proposals.
      gt_valid: [G] bool mask of real gts.
      allow_low_quality: RPN mode — every gt keeps its best-overlap anchors.

    Returns:
      matches: [N] int32 — gt index, or BELOW_LOW_THRESHOLD / BETWEEN_THRESHOLDS.
    """
    quality = jnp.where(gt_valid[:, None], quality, -1.0)
    matched_vals = jnp.max(quality, axis=0)
    matches = jnp.argmax(quality, axis=0).astype(jnp.int32)

    below = matched_vals < low_threshold
    between = (matched_vals >= low_threshold) & (matched_vals < high_threshold)
    out = jnp.where(below, BELOW_LOW_THRESHOLD, matches)
    out = jnp.where(between, BETWEEN_THRESHOLDS, out)

    if allow_low_quality:
        # For each gt, proposals tying its best quality keep the raw match.
        # DELIBERATE deviation (documented, per the parity-notes policy):
        # the `best_per_gt > 0` guard skips gts with ZERO overlap against
        # every anchor.  torchvision's set_low_quality_matches_ has no
        # guard, so such a degenerate gt would mark ALL zero-IoU anchors
        # (i.e. every anchor not overlapping it) as its positives —
        # clearly unintended reference behavior; here they stay
        # background.  tests/test_targets.py pins both the parity on
        # nonzero-best rows and this zero-best divergence.
        best_per_gt = jnp.max(quality, axis=1, keepdims=True)  # [G, 1]
        is_best = (quality == best_per_gt) & gt_valid[:, None] & (best_per_gt > 0)
        pred_is_some_best = jnp.any(is_best, axis=0)
        out = jnp.where(pred_is_some_best, matches, out)
    return out


class SampleResult(NamedTuple):
    idx: jnp.ndarray        # [K] int32 indices into proposals
    is_pos: jnp.ndarray     # [K] bool
    valid: jnp.ndarray      # [K] bool (slot holds a real sample)


def balanced_sample(
    labels: jnp.ndarray,
    rng: jax.Array,
    batch_size: int,
    positive_fraction: float,
) -> SampleResult:
    """torchvision ``BalancedPositiveNegativeSampler`` for one image.

    labels: [N] — >=1 positive, 0 negative, -1 ignored (as produced by the
    matcher path, see /root/reference/models/matchrcnn.py:108-114).
    Returns exactly ``batch_size`` slots (valid-masked if candidates run out).
    """
    n = labels.shape[0]
    pos_mask = labels >= 1
    neg_mask = labels == 0

    max_pos = int(batch_size * positive_fraction)
    n_pos = jnp.minimum(jnp.sum(pos_mask), max_pos)
    n_neg = jnp.minimum(jnp.sum(neg_mask), batch_size - n_pos)

    r = jax.random.uniform(rng, (n,))
    # Random rank among positives / negatives.
    pos_rank = jnp.argsort(jnp.argsort(jnp.where(pos_mask, r, 2.0)))
    neg_rank = jnp.argsort(jnp.argsort(jnp.where(neg_mask, r, 2.0)))
    sel_pos = pos_mask & (pos_rank < n_pos)
    sel_neg = neg_mask & (neg_rank < n_neg)

    # Pack selections into batch_size slots: positives first, then negatives.
    key = jnp.where(sel_pos, 3.0 + r, jnp.where(sel_neg, 1.0 + r, r - 10.0))
    _, idx = jax.lax.top_k(key, batch_size)
    idx = idx.astype(jnp.int32)
    chosen = sel_pos[idx] | sel_neg[idx]
    return SampleResult(idx=idx, is_pos=sel_pos[idx], valid=chosen)


def assign_and_sample(
    proposals: jnp.ndarray,
    proposal_valid: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_labels: jnp.ndarray,
    gt_valid: jnp.ndarray,
    rng: jax.Array,
    batch_size: int,
    positive_fraction: float,
    fg_iou: float,
    bg_iou: float,
) -> Tuple[jnp.ndarray, jnp.ndarray, SampleResult]:
    """RoI-heads training-target assignment for one image, mirroring
    ``select_training_samples`` (/root/reference/models/matchrcnn.py:145-167)
    minus the gt-append (done by the caller so shapes stay static).

    Returns (matched_gt_idx[N], labels[N], sample).
    labels: 0 background, -1 ignore, else class label of matched gt; padded
    (invalid) proposals are forced to -1 so they are never sampled.
    """
    from .boxes import box_iou

    quality = box_iou(gt_boxes, proposals)
    matches = match_proposals(quality, gt_valid, fg_iou, bg_iou)
    clamped = jnp.maximum(matches, 0)
    labels = gt_labels[clamped].astype(jnp.int32)
    labels = jnp.where(matches == BELOW_LOW_THRESHOLD, 0, labels)
    labels = jnp.where(matches == BETWEEN_THRESHOLDS, -1, labels)
    labels = jnp.where(proposal_valid, labels, -1)
    sample = balanced_sample(labels, rng, batch_size, positive_fraction)
    return clamped, labels, sample
