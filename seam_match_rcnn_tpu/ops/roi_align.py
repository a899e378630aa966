"""Multi-level FPN RoIAlign, TPU-native.

Replaces torchvision's C++/CUDA ``roi_align`` + ``MultiScaleRoIAlign``
(reference use: /root/reference/models/matchrcnn.py:21-28,351,394,426,463).
Semantics match torchvision with ``aligned=False``:

* roi coords scaled by the level's spatial scale, *no* half-pixel offset;
* roi width/height floored at 1.0;
* ``sampling_ratio`` × ``sampling_ratio`` bilinear samples per output bin at
  ``start + (bin + (s + 0.5)/ratio) * bin_size``, averaged;
* samples outside [-1, H] ⇒ 0; coords clamped to [0, H-1] with the
  torchvision border rule (y_low ≥ H-1 ⇒ y = y_low = y_high = H-1);
* FPN level per roi: ``floor(4 + log2(sqrt(area)/224) + 1e-6)`` clamped to
  [2, 5] (torchvision ``LevelMapper``), levels P2..P5 at scales 1/4..1/32.

Implementation: all levels of one image are flattened into a single
``[Σ H_l·W_l, C]`` table so a roi's level choice becomes an index offset and
one gather serves every level.  Work is chunked over rois to bound the
transient ``[chunk, P, P, C]`` buffer.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def fpn_level_indices(
    rois: jnp.ndarray,
    num_levels: int = 4,
    canonical_scale: float = 224.0,
    canonical_level: int = 4,
    k_min: int = 2,
) -> jnp.ndarray:
    """torchvision LevelMapper: [N, 4] xyxy rois -> [N] level index in
    [0, num_levels)."""
    area = jnp.maximum(
        (rois[..., 2] - rois[..., 0]) * (rois[..., 3] - rois[..., 1]), 0.0
    )
    s = jnp.sqrt(area)
    lvl = jnp.floor(canonical_level + jnp.log2(s / canonical_scale + 1e-12) + 1e-6)
    lvl = jnp.clip(lvl, k_min, k_min + num_levels - 1)
    return (lvl - k_min).astype(jnp.int32)


def _bilinear_params(coord: jnp.ndarray, size: int):
    """torchvision bilinear_interpolate index/weight rule along one axis.

    Returns (low, high, w_low, w_high, in_range) for [..., ] sample coords.
    """
    in_range = (coord >= -1.0) & (coord <= size)
    c = jnp.clip(coord, 0.0, None)
    low = jnp.floor(c).astype(jnp.int32)
    at_border = low >= size - 1
    low = jnp.where(at_border, size - 1, low)
    high = jnp.where(at_border, size - 1, low + 1)
    c = jnp.where(at_border, low.astype(c.dtype), c)
    lerp = c - low.astype(c.dtype)
    return low, high, 1.0 - lerp, lerp, in_range


def _sample_axis(start, bin_size, out_size: int, ratio: int, size):
    """Sample coordinates along one axis: [N, out_size*ratio]."""
    idx = jnp.arange(out_size * ratio)
    bins = idx // ratio
    sub = idx % ratio
    offs = bins.astype(jnp.float32) * bin_size[:, None] + (
        (sub.astype(jnp.float32) + 0.5) / ratio
    ) * bin_size[:, None]
    return start[:, None] + offs


@functools.partial(
    jax.jit, static_argnames=("output_size", "sampling_ratio", "roi_chunk")
)
def multilevel_roi_align(
    features: Sequence[jnp.ndarray],
    rois: jnp.ndarray,
    output_size: int,
    sampling_ratio: int = 2,
    spatial_scales: Tuple[float, ...] = (0.25, 0.125, 0.0625, 0.03125),
    canonical_scale: float = 224.0,
    canonical_level: int = 4,
    roi_chunk: int = 500,
) -> jnp.ndarray:
    """RoIAlign over a 4-level FPN pyramid for a single image.

    Args:
      features: list of [H_l, W_l, C] arrays (P2..P5).
      rois: [N, 4] xyxy boxes in input-image coordinates.
      output_size: pooled side (7 for boxes, 14 for masks/match).
      sampling_ratio: bilinear samples per bin side (reference uses 2).
      roi_chunk: rois processed per scan step (bounds transient memory).

    Returns: [N, output_size, output_size, C].
    """
    num_levels = len(features)
    c = features[0].shape[-1]
    dtype = features[0].dtype

    heights = jnp.array([f.shape[0] for f in features], dtype=jnp.int32)
    widths = jnp.array([f.shape[1] for f in features], dtype=jnp.int32)
    sizes = [f.shape[0] * f.shape[1] for f in features]
    offsets = jnp.array(
        [sum(sizes[:i]) for i in range(num_levels)], dtype=jnp.int32
    )
    scales = jnp.array(spatial_scales, dtype=jnp.float32)
    table = jnp.concatenate([f.reshape(-1, c) for f in features], axis=0)
    # One zero row appended: out-of-range samples gather it harmlessly.
    table = jnp.concatenate([table, jnp.zeros((1, c), dtype=dtype)], axis=0)
    zero_row = table.shape[0] - 1

    n = rois.shape[0]
    pad = (-n) % roi_chunk
    rois_p = jnp.pad(rois, ((0, pad), (0, 0)))
    levels = fpn_level_indices(
        rois_p, num_levels, canonical_scale, canonical_level
    )

    p = output_size * sampling_ratio

    def align_chunk(_, chunk):
        boxes, lvl = chunk
        scale = scales[lvl]
        h = heights[lvl]
        w = widths[lvl]
        off = offsets[lvl]

        x1 = boxes[:, 0] * scale
        y1 = boxes[:, 1] * scale
        roi_w = jnp.maximum(boxes[:, 2] * scale - x1, 1.0)
        roi_h = jnp.maximum(boxes[:, 3] * scale - y1, 1.0)
        bin_w = roi_w / output_size
        bin_h = roi_h / output_size

        ys = _sample_axis(y1, bin_h, output_size, sampling_ratio, h)  # [B,P]
        xs = _sample_axis(x1, bin_w, output_size, sampling_ratio, w)

        ylo, yhi, wylo, wyhi, yin = _bilinear_params(ys, h[:, None])
        xlo, xhi, wxlo, wxhi, xin = _bilinear_params(xs, w[:, None])

        valid = (yin[:, :, None] & xin[:, None, :])  # [B,P,P]

        def gather(yidx, xidx):
            flat = off[:, None, None] + yidx[:, :, None] * w[:, None, None] + xidx[:, None, :]
            flat = jnp.where(valid, flat, zero_row)
            return table[flat]  # [B,P,P,C]

        acc = (
            gather(ylo, xlo) * (wylo[:, :, None] * wxlo[:, None, :])[..., None]
            + gather(ylo, xhi) * (wylo[:, :, None] * wxhi[:, None, :])[..., None]
            + gather(yhi, xlo) * (wyhi[:, :, None] * wxlo[:, None, :])[..., None]
            + gather(yhi, xhi) * (wyhi[:, :, None] * wxhi[:, None, :])[..., None]
        )
        out = acc.reshape(
            -1, output_size, sampling_ratio, output_size, sampling_ratio, c
        ).mean(axis=(2, 4))
        return None, out.astype(dtype)

    chunks_boxes = rois_p.reshape(-1, roi_chunk, 4)
    chunks_lvl = levels.reshape(-1, roi_chunk)
    _, outs = jax.lax.scan(align_chunk, None, (chunks_boxes, chunks_lvl))
    out = outs.reshape(-1, output_size, output_size, c)
    return out[:n]


def batched_multilevel_roi_align(
    features: Sequence[jnp.ndarray],
    rois: jnp.ndarray,
    output_size: int,
    **kwargs,
) -> jnp.ndarray:
    """vmap wrapper: features [B, H_l, W_l, C] per level, rois [B, R, 4]
    -> [B, R, out, out, C]."""
    fn = lambda feats, r: multilevel_roi_align(feats, r, output_size, **kwargs)
    return jax.vmap(fn)(tuple(features), rois)


@functools.partial(
    jax.jit,
    static_argnames=("level_shapes", "output_size", "sampling_ratio",
                     "roi_chunk"),
)
def multilevel_roi_align_adjoint(
    g: jnp.ndarray,
    level_shapes: Tuple[Tuple[int, int], ...],
    rois: jnp.ndarray,
    output_size: int,
    sampling_ratio: int = 2,
    spatial_scales: Tuple[float, ...] = (0.25, 0.125, 0.0625, 0.03125),
    canonical_scale: float = 224.0,
    canonical_level: int = 4,
    roi_chunk: int = 128,
) -> Tuple[jnp.ndarray, ...]:
    """Exact adjoint of ``multilevel_roi_align`` w.r.t. ``features``.

    RoIAlign is linear in the features, so its vjp is a fixed scatter-add of
    bilinear-weighted cotangents — computed here directly from the same
    index/weight rule as the forward, WITHOUT re-running the gather forward
    (jax.vjp of the forward would).  Used as the backward of the Pallas
    serving kernel (ops/pallas_roi_align.pallas_roi_align_trainable).

    g: [N, out, out, C] cotangent; returns per-level [H_l, W_l, C] grads.
    """
    num_levels = len(level_shapes)
    c = g.shape[-1]
    heights = jnp.array([s[0] for s in level_shapes], dtype=jnp.int32)
    widths = jnp.array([s[1] for s in level_shapes], dtype=jnp.int32)
    sizes = [h * w for h, w in level_shapes]
    offsets = jnp.array(
        [sum(sizes[:i]) for i in range(num_levels)], dtype=jnp.int32
    )
    scales = jnp.array(spatial_scales, dtype=jnp.float32)
    total = sum(sizes)
    zero_row = total  # same harmless slot as the forward's padded table

    n = rois.shape[0]
    pad = (-n) % roi_chunk
    rois_p = jnp.pad(rois, ((0, pad), (0, 0)))
    g_p = jnp.pad(g.astype(jnp.float32),
                  ((0, pad), (0, 0), (0, 0), (0, 0)))
    levels = fpn_level_indices(
        rois_p, num_levels, canonical_scale, canonical_level
    )

    r = sampling_ratio

    def chunk_body(table_grad, chunk):
        boxes, lvl, gc = chunk
        scale = scales[lvl]
        h = heights[lvl]
        w = widths[lvl]
        off = offsets[lvl]

        x1 = boxes[:, 0] * scale
        y1 = boxes[:, 1] * scale
        roi_w = jnp.maximum(boxes[:, 2] * scale - x1, 1.0)
        roi_h = jnp.maximum(boxes[:, 3] * scale - y1, 1.0)
        bin_w = roi_w / output_size
        bin_h = roi_h / output_size

        ys = _sample_axis(y1, bin_h, output_size, r, h)   # [B, P]
        xs = _sample_axis(x1, bin_w, output_size, r, w)
        ylo, yhi, wylo, wyhi, yin = _bilinear_params(ys, h[:, None])
        xlo, xhi, wxlo, wxhi, xin = _bilinear_params(xs, w[:, None])
        valid = yin[:, :, None] & xin[:, None, :]          # [B, P, P]

        # per-sample cotangent: each bin's grad split evenly over its r*r
        # samples (the forward's mean pool)
        gs = jnp.repeat(jnp.repeat(gc, r, axis=1), r, axis=2) / (r * r)

        b = boxes.shape[0]
        p = output_size * r
        for yidx, wy in ((ylo, wylo), (yhi, wyhi)):
            for xidx, wx in ((xlo, wxlo), (xhi, wxhi)):
                flat = (off[:, None, None] + yidx[:, :, None] * w[:, None, None]
                        + xidx[:, None, :])
                flat = jnp.where(valid, flat, zero_row)
                wgt = (wy[:, :, None] * wx[:, None, :])[..., None]
                table_grad = table_grad.at[flat.reshape(b * p * p)].add(
                    (gs * wgt).reshape(b * p * p, c)
                )
        return table_grad, None

    table_grad = jnp.zeros((total + 1, c), jnp.float32)
    table_grad, _ = jax.lax.scan(
        chunk_body,
        table_grad,
        (
            rois_p.reshape(-1, roi_chunk, 4),
            levels.reshape(-1, roi_chunk),
            g_p.reshape(-1, roi_chunk, output_size, output_size, c),
        ),
    )
    outs = []
    start = 0
    for (h, w), size in zip(level_shapes, sizes):
        outs.append(table_grad[start:start + size].reshape(h, w, c))
        start += size
    return tuple(outs)
