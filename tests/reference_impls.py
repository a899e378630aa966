"""Naive numpy oracles replicating torchvision semantics.

torchvision is not installed in this environment, so these independent
implementations of its documented algorithms (greedy NMS, RoIAlign
aligned=False, BoxCoder) serve as the golden references for the TPU kernels.
"""

import numpy as np


def nms_ref(boxes, scores, iou_threshold):
    """Greedy NMS, returns kept indices in score order."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), dtype=bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        x1 = np.maximum(boxes[i, 0], boxes[:, 0])
        y1 = np.maximum(boxes[i, 1], boxes[:, 1])
        x2 = np.minimum(boxes[i, 2], boxes[:, 2])
        y2 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
        area_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        union = area_i + areas - inter
        iou = np.where(union > 0, inter / union, 0.0)
        suppressed |= iou > iou_threshold
    return np.asarray(keep, dtype=np.int32)


def _bilinear(data, h, w, y, x):
    """torchvision bilinear_interpolate (roi_align.cpp)."""
    if y < -1.0 or y > h or x < -1.0 or x > w:
        return np.zeros(data.shape[-1], dtype=data.dtype)
    y = max(y, 0.0)
    x = max(x, 0.0)
    y_low = int(y)
    x_low = int(x)
    if y_low >= h - 1:
        y_high = y_low = h - 1
        y = float(y_low)
    else:
        y_high = y_low + 1
    if x_low >= w - 1:
        x_high = x_low = w - 1
        x = float(x_low)
    else:
        x_high = x_low + 1
    ly = y - y_low
    lx = x - x_low
    hy = 1.0 - ly
    hx = 1.0 - lx
    return (
        hy * hx * data[y_low, x_low]
        + hy * lx * data[y_low, x_high]
        + ly * hx * data[y_high, x_low]
        + ly * lx * data[y_high, x_high]
    )


def roi_align_ref(feature, rois, spatial_scale, output_size, sampling_ratio):
    """torchvision roi_align with aligned=False.  feature: [H, W, C]."""
    h, w, c = feature.shape
    n = rois.shape[0]
    out = np.zeros((n, output_size, output_size, c), dtype=np.float64)
    for i in range(n):
        x1, y1, x2, y2 = rois[i] * spatial_scale
        roi_w = max(x2 - x1, 1.0)
        roi_h = max(y2 - y1, 1.0)
        bin_w = roi_w / output_size
        bin_h = roi_h / output_size
        for ph in range(output_size):
            for pw in range(output_size):
                acc = np.zeros(c, dtype=np.float64)
                for iy in range(sampling_ratio):
                    yy = y1 + ph * bin_h + (iy + 0.5) * bin_h / sampling_ratio
                    for ix in range(sampling_ratio):
                        xx = x1 + pw * bin_w + (ix + 0.5) * bin_w / sampling_ratio
                        acc += _bilinear(feature, h, w, yy, xx)
                out[i, ph, pw] = acc / (sampling_ratio * sampling_ratio)
    return out


def level_map_ref(rois, k_min=2, k_max=5, s0=224.0, lvl0=4):
    area = np.maximum((rois[:, 2] - rois[:, 0]) * (rois[:, 3] - rois[:, 1]), 0)
    s = np.sqrt(area)
    lvl = np.floor(lvl0 + np.log2(s / s0 + 1e-12) + 1e-6)
    return (np.clip(lvl, k_min, k_max) - k_min).astype(np.int32)


def paste_masks_ref(masks, boxes, im_h, im_w):
    """torchvision ``paste_masks_in_image`` (padding=1) in torch — the exact
    reference-eval mask postprocess (GeneralizedRCNN.postprocess applied to
    /root/reference/models/video_matchrcnn.py:292 outputs): zero-pad the MxM
    mask by 1, expand the box by (M+2)/M, round it to int64, bilinearly
    resize to the integer box size (align_corners=False) and scatter the
    in-image slice.  masks: [N, M, M] float; boxes: [N, 4] xyxy float.
    Returns [N, im_h, im_w] float probabilities."""
    import torch
    import torch.nn.functional as F

    masks_t = torch.as_tensor(np.asarray(masks), dtype=torch.float32)
    boxes_np = np.asarray(boxes, np.float64)
    m = masks_t.shape[-1]
    scale = (m + 2.0) / m
    padded = F.pad(masks_t, (1, 1, 1, 1))

    w_half = (boxes_np[:, 2] - boxes_np[:, 0]) * 0.5 * scale
    h_half = (boxes_np[:, 3] - boxes_np[:, 1]) * 0.5 * scale
    x_c = (boxes_np[:, 2] + boxes_np[:, 0]) * 0.5
    y_c = (boxes_np[:, 3] + boxes_np[:, 1]) * 0.5
    exp = np.stack([x_c - w_half, y_c - h_half, x_c + w_half, y_c + h_half],
                   axis=1).astype(np.int64)

    out = np.zeros((len(boxes_np), im_h, im_w), np.float32)
    for i, box in enumerate(exp):
        w = max(int(box[2] - box[0] + 1), 1)
        h = max(int(box[3] - box[1] + 1), 1)
        resized = F.interpolate(padded[i][None, None], size=(h, w),
                                mode="bilinear", align_corners=False)[0, 0]
        x0, x1 = max(box[0], 0), min(box[2] + 1, im_w)
        y0, y1 = max(box[1], 0), min(box[3] + 1, im_h)
        if x1 > x0 and y1 > y0:
            out[i, y0:y1, x0:x1] = resized[
                (y0 - box[1]):(y1 - box[1]), (x0 - box[0]):(x1 - box[0])
            ].numpy()
    return out
