"""Detection postprocessing with static shapes.

Replaces the reference's ``postprocess_detections``
(/root/reference/models/matchrcnn.py:280-331, duplicated at
video_matchrcnn.py:154-205): per-class score filter, small-box removal,
class-batched NMS, top ``detections_per_img`` — all padded/masked.  Also
implements the whole-image fallback box emitted when an image has no
detections (score 1.0 for MatchRCNN at matchrcnn.py:373-380, score 0.1 for
the video variant at video_matchrcnn.py:247-253).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import RoIHeadsConfig
from ..ops import boxes as box_ops
from ..ops.nms import batched_nms_padded


class Detections(NamedTuple):
    boxes: jnp.ndarray   # [B, D, 4] canvas coords
    scores: jnp.ndarray  # [B, D]
    labels: jnp.ndarray  # [B, D] int32 (1-based classes; 0 only for fallback)
    valid: jnp.ndarray   # [B, D] bool


def postprocess_detections(
    class_logits: jnp.ndarray,
    box_deltas: jnp.ndarray,
    proposals: jnp.ndarray,
    proposal_valid: jnp.ndarray,
    image_sizes: jnp.ndarray,
    cfg: RoIHeadsConfig,
    fallback_score: float = 1.0,
    nms_pre: int = 2048,
) -> Detections:
    """class_logits: [B, R, C]; box_deltas: [B, R, 4C]; proposals: [B, R, 4].

    ``nms_pre`` caps the per-image candidate count entering NMS (score-sorted
    truncation); with detections_per_img=100 and score_thresh=0.05 this is
    far beyond the populated range.
    """
    num_classes = class_logits.shape[-1]
    d = cfg.detections_per_img

    def per_image(logits, deltas, props, pvalid, size):
        r = logits.shape[0]
        scores = jax.nn.softmax(logits, axis=-1)          # [R, C]
        boxes = box_ops.decode_boxes(
            deltas.reshape(r, num_classes, 4), props[:, None, :], cfg.bbox_reg_weights
        )                                                  # [R, C, 4]
        boxes = box_ops.clip_boxes_to_image(boxes, size)

        # Drop background column, flatten classes into candidates.
        fg_boxes = boxes[:, 1:].reshape(-1, 4)
        fg_scores = scores[:, 1:].reshape(-1)
        fg_labels = jnp.tile(jnp.arange(1, num_classes, dtype=jnp.int32), (r,))

        keep = fg_scores > cfg.score_thresh
        keep &= box_ops.small_box_mask(fg_boxes, 1e-2)
        keep &= jnp.repeat(pvalid, num_classes - 1)

        k = min(nms_pre, fg_scores.shape[0])
        top_scores, top_idx = jax.lax.top_k(jnp.where(keep, fg_scores, -1.0), k)
        cand_boxes = fg_boxes[top_idx]
        cand_labels = fg_labels[top_idx]
        cand_valid = top_scores > 0

        idx, mask = batched_nms_padded(
            cand_boxes, top_scores, cand_labels, cfg.nms_thresh, d, valid=cand_valid
        )
        safe = jnp.maximum(idx, 0)
        out_boxes = cand_boxes[safe]
        out_scores = jnp.where(mask, top_scores[safe], 0.0)
        out_labels = jnp.where(mask, cand_labels[safe], 0)

        # Whole-image fallback when nothing survives.
        none = ~jnp.any(mask)
        fb_box = jnp.array([0.0, 0.0, 0.0, 0.0]).at[2].set(size[1]).at[3].set(size[0])
        out_boxes = jnp.where(none, jnp.zeros_like(out_boxes).at[0].set(fb_box), out_boxes)
        out_scores = jnp.where(none, jnp.zeros_like(out_scores).at[0].set(fallback_score), out_scores)
        out_labels = jnp.where(none, jnp.zeros_like(out_labels), out_labels)
        out_mask = jnp.where(none, jnp.zeros_like(mask).at[0].set(True), mask)
        return out_boxes, out_scores, out_labels, out_mask

    b, s, l, v = jax.vmap(per_image)(
        class_logits, box_deltas, proposals, proposal_valid,
        image_sizes.astype(class_logits.dtype),
    )
    return Detections(boxes=b, scores=s, labels=l, valid=v)


def prepend_gt(
    det: Detections,
    gt_boxes: jnp.ndarray,
    gt_labels: jnp.ndarray,
    gt_valid: jnp.ndarray,
) -> Detections:
    """Video-model eval path: GT boxes are prepended to the detections with
    score 1.0 (/root/reference/models/video_matchrcnn.py:255-262)."""
    ones = jnp.ones(gt_valid.shape, det.scores.dtype)
    return Detections(
        boxes=jnp.concatenate([gt_boxes, det.boxes], axis=1),
        scores=jnp.concatenate([jnp.where(gt_valid, ones, 0.0), det.scores], axis=1),
        labels=jnp.concatenate([gt_labels.astype(det.labels.dtype), det.labels], axis=1),
        valid=jnp.concatenate([gt_valid, det.valid], axis=1),
    )
