"""Box primitives: IoU, encode/decode, clipping, filtering.

TPU-native equivalents of ``torchvision.ops.boxes`` and torchvision's
``BoxCoder`` which the reference relies on throughout
(/root/reference/models/matchrcnn.py:5,66,280-331).  All functions are pure,
static-shape jnp and safe under ``jit``/``vmap``; padded/invalid boxes are
handled with masks instead of dynamic filtering.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp

# torchvision BoxCoder clamps dw/dh at log(1000/16) before exp.
BBOX_XFORM_CLIP = math.log(1000.0 / 16.0)


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Area of [..., 4] xyxy boxes."""
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU between [N, 4] and [M, 4] xyxy boxes -> [N, M].

    Matches ``torchvision.ops.box_iou`` semantics (no +1 offsets), used as
    ``box_similarity`` in the reference RoI heads
    (/root/reference/models/matchrcnn.py:66,100).
    """
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = jnp.minimum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[:, None] + area2[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


def box_iou_xywh(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU between xywh boxes, matching ``pycocotools.mask.iou`` on
    box inputs (every in-reference ``maskUtils.iou`` call passes boxes:
    /root/reference/models/match_head.py:451, /root/reference/stuffs/engine.py:278).

    In-graph (jnp) variant; the host pipelines use the numpy/native twin
    ``ops.rle.box_iou_xywh``.  Semantics live in ``box_iou`` — this is
    only the xywh->xyxy shim.
    """
    x1 = jnp.stack(
        [boxes1[:, 0], boxes1[:, 1], boxes1[:, 0] + boxes1[:, 2], boxes1[:, 1] + boxes1[:, 3]],
        axis=-1,
    )
    x2 = jnp.stack(
        [boxes2[:, 0], boxes2[:, 1], boxes2[:, 0] + boxes2[:, 2], boxes2[:, 1] + boxes2[:, 3]],
        axis=-1,
    )
    return box_iou(x1, x2)


def clip_boxes_to_image(boxes: jnp.ndarray, size_hw) -> jnp.ndarray:
    """Clip [..., 4] xyxy boxes to an image of (h, w).

    ``size_hw`` may be a static tuple or a traced [2] array (per-image valid
    size inside a padded canvas).
    """
    h, w = size_hw[0], size_hw[1]
    x1 = jnp.clip(boxes[..., 0], 0, w)
    y1 = jnp.clip(boxes[..., 1], 0, h)
    x2 = jnp.clip(boxes[..., 2], 0, w)
    y2 = jnp.clip(boxes[..., 3], 0, h)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def small_box_mask(boxes: jnp.ndarray, min_size: float) -> jnp.ndarray:
    """True for boxes with both sides >= min_size (the *keep* mask).

    Mask-based equivalent of ``torchvision.ops.remove_small_boxes`` used at
    /root/reference/models/matchrcnn.py:318 (min 1e-2) and inside the RPN.
    """
    ws = boxes[..., 2] - boxes[..., 0]
    hs = boxes[..., 3] - boxes[..., 1]
    return (ws >= min_size) & (hs >= min_size)


def encode_boxes(
    reference_boxes: jnp.ndarray, proposals: jnp.ndarray, weights: Tuple[float, float, float, float]
) -> jnp.ndarray:
    """torchvision ``BoxCoder.encode_single``: regression targets [..., 4]."""
    wx, wy, ww, wh = weights
    ex_w = proposals[..., 2] - proposals[..., 0]
    ex_h = proposals[..., 3] - proposals[..., 1]
    ex_cx = proposals[..., 0] + 0.5 * ex_w
    ex_cy = proposals[..., 1] + 0.5 * ex_h

    gt_w = reference_boxes[..., 2] - reference_boxes[..., 0]
    gt_h = reference_boxes[..., 3] - reference_boxes[..., 1]
    gt_cx = reference_boxes[..., 0] + 0.5 * gt_w
    gt_cy = reference_boxes[..., 1] + 0.5 * gt_h

    # Guard padded/degenerate proposals against div/log of 0.
    ex_w = jnp.maximum(ex_w, 1e-8)
    ex_h = jnp.maximum(ex_h, 1e-8)
    gt_w = jnp.maximum(gt_w, 1e-8)
    gt_h = jnp.maximum(gt_h, 1e-8)

    tx = wx * (gt_cx - ex_cx) / ex_w
    ty = wy * (gt_cy - ex_cy) / ex_h
    tw = ww * jnp.log(gt_w / ex_w)
    th = wh * jnp.log(gt_h / ex_h)
    return jnp.stack([tx, ty, tw, th], axis=-1)


def decode_boxes(
    deltas: jnp.ndarray, boxes: jnp.ndarray, weights: Tuple[float, float, float, float]
) -> jnp.ndarray:
    """torchvision ``BoxCoder.decode_single``.

    deltas: [..., 4]; ``boxes`` must broadcast against ``deltas[..., 0]``
    along the leading axes — for per-class deltas [R, C, 4] pass boxes
    expanded to [R, 1, 4] (as models/detection.py does); passing [R, 4]
    there would raise (or, when C == R, silently mis-broadcast).
    """
    wx, wy, ww, wh = weights
    widths = boxes[..., 2] - boxes[..., 0]
    heights = boxes[..., 3] - boxes[..., 1]
    ctr_x = boxes[..., 0] + 0.5 * widths
    ctr_y = boxes[..., 1] + 0.5 * heights

    dx = deltas[..., 0] / wx
    dy = deltas[..., 1] / wy
    dw = jnp.minimum(deltas[..., 2] / ww, BBOX_XFORM_CLIP)
    dh = jnp.minimum(deltas[..., 3] / wh, BBOX_XFORM_CLIP)

    pred_ctr_x = dx * widths + ctr_x
    pred_ctr_y = dy * heights + ctr_y
    pred_w = jnp.exp(dw) * widths
    pred_h = jnp.exp(dh) * heights

    return jnp.stack(
        [
            pred_ctr_x - 0.5 * pred_w,
            pred_ctr_y - 0.5 * pred_h,
            pred_ctr_x + 0.5 * pred_w,
            pred_ctr_y + 0.5 * pred_h,
        ],
        axis=-1,
    )
