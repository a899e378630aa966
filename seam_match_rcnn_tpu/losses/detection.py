"""Detection losses: Fast R-CNN, Mask R-CNN, RPN.

Equivalents of torchvision's ``fastrcnn_loss`` / ``maskrcnn_loss`` /
``RegionProposalNetwork.compute_loss`` imported by the reference at
/root/reference/models/matchrcnn.py:7 and used at matchrcnn.py:357,402.
All reductions are masked so padded samples contribute zero, with the same
denominators torchvision uses (total sampled count).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops import boxes as box_ops
from ..ops.roi_align import multilevel_roi_align


def smooth_l1(x: jnp.ndarray, beta: float = 1.0 / 9.0) -> jnp.ndarray:
    ax = jnp.abs(x)
    return jnp.where(ax < beta, 0.5 * ax * ax / beta, ax - 0.5 * beta)


def softmax_ce(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Per-example cross entropy, labels int (invalid entries: pass 0 and
    mask outside)."""
    logz = jax.nn.logsumexp(logits, axis=-1)
    picked = jnp.take_along_axis(logits, labels[..., None], axis=-1)[..., 0]
    return logz - picked


def fastrcnn_loss(
    class_logits: jnp.ndarray,
    box_deltas: jnp.ndarray,
    labels: jnp.ndarray,
    regression_targets: jnp.ndarray,
    valid: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """torchvision fastrcnn_loss with padding masks.

    class_logits: [N, C]; box_deltas: [N, 4C]; labels: [N] (0 = bg);
    regression_targets: [N, 4] (vs the matched gt); valid: [N].
    """
    cls_sum, box_sum, denom = fastrcnn_loss_parts(
        class_logits, box_deltas, labels, regression_targets, valid)
    denom = jnp.maximum(denom, 1)
    return cls_sum / denom, box_sum / denom


def fastrcnn_loss_parts(
    class_logits: jnp.ndarray,
    box_deltas: jnp.ndarray,
    labels: jnp.ndarray,
    regression_targets: jnp.ndarray,
    valid: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Unnormalized (cls_sum, box_sum, n_valid) — the normalizer spans the
    whole training batch in torchvision's fastrcnn_loss, so orientation-
    bucketed steps must sum numerators/denominators ACROSS buckets before
    dividing (train/steps.Phase1Trainer) to match the reference's fused
    mixed batch."""
    n, c = class_logits.shape
    safe_labels = jnp.where(valid, labels, 0)
    ce = softmax_ce(class_logits, safe_labels)
    cls_sum = jnp.sum(jnp.where(valid, ce, 0.0))

    pos = valid & (labels > 0)
    per_class = box_deltas.reshape(n, c, 4)
    picked = jnp.take_along_axis(
        per_class, safe_labels[:, None, None].repeat(4, -1), axis=1
    )[:, 0]
    l1 = jnp.sum(smooth_l1(picked - regression_targets), axis=-1)
    box_sum = jnp.sum(jnp.where(pos, l1, 0.0))
    return cls_sum, box_sum, jnp.sum(valid)


def maskrcnn_loss(
    mask_logits: jnp.ndarray,
    mask_targets: jnp.ndarray,
    labels: jnp.ndarray,
    valid: jnp.ndarray,
) -> jnp.ndarray:
    """torchvision maskrcnn_loss: BCE-with-logits on the 28x28 mask of the
    matched class, mean over positives x pixels.

    mask_logits: [P, 28, 28, C]; mask_targets: [P, 28, 28] in [0,1];
    labels: [P] class of the matched gt; valid: [P].
    """
    bce_sum, n_valid = maskrcnn_loss_parts(
        mask_logits, mask_targets, labels, valid)
    denom = jnp.maximum(n_valid, 1) * (
        mask_targets.shape[1] * mask_targets.shape[2])
    return bce_sum / denom


def maskrcnn_loss_parts(
    mask_logits: jnp.ndarray,
    mask_targets: jnp.ndarray,
    labels: jnp.ndarray,
    valid: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Unnormalized (bce_sum, n_valid); the mean is over positives x pixels
    of the WHOLE batch — see fastrcnn_loss_parts for why bucketed steps
    need the pieces."""
    safe = jnp.maximum(labels, 0)
    per_label = jnp.take_along_axis(
        mask_logits, safe[:, None, None, None], axis=-1
    )[..., 0]
    bce = jnp.maximum(per_label, 0) - per_label * mask_targets + jnp.log1p(
        jnp.exp(-jnp.abs(per_label))
    )
    bce_sum = jnp.sum(jnp.where(valid[:, None, None], bce, 0.0))
    return bce_sum, jnp.sum(valid)


def mask_targets_from_crops(
    gt_mask_crops: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    proposals: jnp.ndarray,
    matched_idx: jnp.ndarray,
    out_size: int = 28,
) -> jnp.ndarray:
    """Project GT masks onto proposal boxes (torchvision
    ``project_masks_on_boxes`` semantics via fixed-size GT crops).

    torchvision roi_aligns the full-image GT mask with the proposal box; here
    the host supplies each GT instance's mask rasterized into a fixed
    [S, S] crop of its own box, and the proposal is mapped into that crop's
    coordinate frame — same bilinear semantics, static shapes.

    gt_mask_crops: [G, S, S] float in [0,1]; gt_boxes: [G, 4];
    proposals: [P, 4]; matched_idx: [P] gt index per proposal.
    Returns [P, out, out].
    """
    s = gt_mask_crops.shape[-1]
    g = gt_boxes[matched_idx]                      # [P, 4]
    gw = jnp.maximum(g[:, 2] - g[:, 0], 1e-6)
    gh = jnp.maximum(g[:, 3] - g[:, 1], 1e-6)
    # proposal in crop coordinates
    x1 = (proposals[:, 0] - g[:, 0]) * (s / gw)
    y1 = (proposals[:, 1] - g[:, 1]) * (s / gh)
    x2 = (proposals[:, 2] - g[:, 0]) * (s / gw)
    y2 = (proposals[:, 3] - g[:, 1]) * (s / gh)
    rois = jnp.stack([x1, y1, x2, y2], axis=-1)

    crops = gt_mask_crops[matched_idx][..., None]  # [P, S, S, 1]

    def one(crop, roi):
        return multilevel_roi_align(
            [crop], roi[None], out_size, sampling_ratio=1,
            spatial_scales=(1.0,), roi_chunk=1,
        )[0, ..., 0]

    return jax.vmap(one)(crops, rois)


def rpn_loss(
    objectness: jnp.ndarray,
    box_deltas: jnp.ndarray,
    anchors: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_valid: jnp.ndarray,
    rng: jax.Array,
    batch_size_per_image: int,
    positive_fraction: float,
    fg_iou: float,
    bg_iou: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """RPN loss for ONE image (vmap over batch, then mean).

    objectness: [N]; box_deltas: [N, 4]; anchors: [N, 4];
    gt_boxes: [G, 4] padded; gt_valid: [G].
    """
    from ..ops.targets import balanced_sample, match_proposals

    quality = box_ops.box_iou(gt_boxes, anchors)
    matches = match_proposals(quality, gt_valid, fg_iou, bg_iou, allow_low_quality=True)
    labels = jnp.where(matches >= 0, 1, jnp.where(matches == -1, 0, -1))
    sample = balanced_sample(labels, rng, batch_size_per_image, positive_fraction)

    sel = sample.idx
    sel_valid = sample.valid
    sel_pos = sample.is_pos
    denom = jnp.maximum(jnp.sum(sel_valid), 1)

    # gather the 256 sampled rows FIRST: encoding targets for all ~270k
    # anchors (and its backward) when only the sample is read is ~1000x
    # wasted div/log work and two full-size intermediates
    matched_gt = gt_boxes[jnp.maximum(matches, 0)[sel]]
    targets = box_ops.encode_boxes(matched_gt, anchors[sel],
                                   (1.0, 1.0, 1.0, 1.0))
    l1 = jnp.sum(smooth_l1(box_deltas[sel] - targets), axis=-1)
    loss_box = jnp.sum(jnp.where(sel_pos, l1, 0.0)) / denom

    logit = objectness[sel]
    y = sel_pos.astype(jnp.float32)
    bce = jnp.maximum(logit, 0) - logit * y + jnp.log1p(jnp.exp(-jnp.abs(logit)))
    loss_obj = jnp.sum(jnp.where(sel_valid, bce, 0.0)) / denom
    return loss_obj, loss_box
