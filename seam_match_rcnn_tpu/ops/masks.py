"""Mask pasting: 28x28 instance masks -> full-image masks.

Equivalent of torchvision's ``paste_masks_in_image`` used by
``GeneralizedRCNN.postprocess`` on the reference's eval outputs (the
``masks`` entries attached at /root/reference/models/video_matchrcnn.py:292).
Semantics: each mask is zero-padded by one pixel, bilinearly resized to its
(rounded-up) box size and written into the image canvas; output is the
binarizable probability map.

Static-shape TPU formulation: instead of a per-instance dynamic resize +
scatter, every output pixel samples the 28x28 mask at its normalized
box-relative coordinate (the padded-resize sampling grid), masked to the box
interior — one vectorized bilinear gather per instance, fixed shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("out_h", "out_w"))
def paste_masks(
    masks: jnp.ndarray,
    boxes: jnp.ndarray,
    out_h: int,
    out_w: int,
) -> jnp.ndarray:
    """masks: [N, M, M] probabilities; boxes: [N, 4] xyxy (image coords).

    Returns [N, out_h, out_w] float probabilities (0 outside boxes).
    """
    n, m, _ = masks.shape
    # torchvision pads the mask with a zero ring then scales the box by
    # (M+2)/M, which makes border interpolation fall off to zero.
    padded = jnp.pad(masks, ((0, 0), (1, 1), (1, 1)))
    scale = (m + 2.0) / m
    cx = (boxes[:, 0] + boxes[:, 2]) * 0.5
    cy = (boxes[:, 1] + boxes[:, 3]) * 0.5
    bw = jnp.maximum((boxes[:, 2] - boxes[:, 0]) * scale, 1e-6)
    bh = jnp.maximum((boxes[:, 3] - boxes[:, 1]) * scale, 1e-6)

    ys = jnp.arange(out_h, dtype=jnp.float32) + 0.5
    xs = jnp.arange(out_w, dtype=jnp.float32) + 0.5
    # normalized [-1, 1] coords of each output pixel wrt the (scaled) box
    gy = (ys[None, :] - cy[:, None]) / (bh[:, None] * 0.5)   # [N, H]
    gx = (xs[None, :] - cx[:, None]) / (bw[:, None] * 0.5)   # [N, W]

    def axis_params(g, size):
        # align_corners=False grid-sample mapping into the padded mask
        c = (g + 1.0) * (size * 0.5) - 0.5
        lo = jnp.floor(c).astype(jnp.int32)
        lerp = c - lo
        lo0 = jnp.clip(lo, 0, size - 1)
        lo1 = jnp.clip(lo + 1, 0, size - 1)
        inside = (c > -1.0) & (c < size)
        return lo0, lo1, lerp, inside

    size = m + 2
    y0, y1, wy, iny = axis_params(gy, size)
    x0, x1, wx, inx = axis_params(gx, size)

    def one(mask, y0i, y1i, wyi, x0i, x1i, wxi, inyi, inxi):
        top = mask[y0i][:, x0i] * (1 - wxi)[None, :] + mask[y0i][:, x1i] * wxi[None, :]
        bot = mask[y1i][:, x0i] * (1 - wxi)[None, :] + mask[y1i][:, x1i] * wxi[None, :]
        out = top * (1 - wyi)[:, None] + bot * wyi[:, None]
        return out * (inyi[:, None] & inxi[None, :])

    return jax.vmap(one)(padded, y0, y1, wy, x0, x1, wx, iny, inx)
