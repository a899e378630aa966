"""Pallas RoIAlign: per-roi patch DMA + separable one-hot interpolation.

The XLA gather formulation of RoIAlign (ops/roi_align.py) is
bandwidth-correct but gather-throughput-bound on TPU (~14 µs/roi measured —
dominating the whole detector).  This kernel restructures the op around the
hardware:

  * each roi DMAs ONE contiguous [PATCH, PATCH, C] window of its FPN level
    from HBM into VMEM (the FPN level mapper bounds a roi's footprint at its
    level to ≈14–28 feature cells per side, so a 40-cell patch covers every
    aspect ratio ≤ ~2.8; larger-aspect outliers clamp to the patch edge —
    documented approximation, exact for typical garment boxes);
  * bilinear sampling becomes two small MXU matmuls with one-hot
    interpolation matrices built on the VPU:
        tmp = W_y @ patch            [P, PATCH] @ [PATCH, PATCH·C]
        out = W_x @ tmpᵀ             (contracted via dot_general)
    followed by the sampling_ratio² average pool;
  * per-roi scalars (level, window origin, sample-grid geometry) arrive via
    scalar prefetch so the DMA address is known before the body runs.

Semantics otherwise follow torchvision aligned=False exactly
(/root/reference/models/matchrcnn.py:21-28 via MultiScaleRoIAlign):
max(roi, 1.0) sizing, (s+0.5)/ratio sample offsets, border clamping,
out-of-image zeroing.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .roi_align import fpn_level_indices

PATCH = 40  # feature cells per patch side


def _prep_scalars(rois, level_shapes, spatial_scales, output_size, sampling_ratio):
    """Per-roi DMA/geometry scalars (all shapes static).

    Returns (lvl [N], y0 [N], x0 [N], fgeom [N, 8]) with fgeom rows
    (sy, sx, bin_h, bin_w, ymin, ymax, xmin, xmax) — sample-grid start and
    bin sizes in patch-local feature units plus the in-range/clamp bounds of
    the image inside the patch frame.
    """
    heights = jnp.asarray([s[0] for s in level_shapes], jnp.float32)
    widths = jnp.asarray([s[1] for s in level_shapes], jnp.float32)
    scales = jnp.asarray(spatial_scales, jnp.float32)

    lvl = fpn_level_indices(rois, num_levels=len(level_shapes))
    sc = scales[lvl]
    h = heights[lvl]
    w = widths[lvl]

    x1 = rois[:, 0] * sc
    y1 = rois[:, 1] * sc
    roi_w = jnp.maximum(rois[:, 2] * sc - x1, 1.0)
    roi_h = jnp.maximum(rois[:, 3] * sc - y1, 1.0)
    bin_w = roi_w / output_size
    bin_h = roi_h / output_size

    # patch origin: center the roi, clamp into the (PATCH-padded) level
    y0 = jnp.floor(y1 + roi_h * 0.5 - PATCH * 0.5)
    x0 = jnp.floor(x1 + roi_w * 0.5 - PATCH * 0.5)
    y0 = jnp.clip(y0, -1.0, jnp.maximum(h - 1.0, 0.0))
    x0 = jnp.clip(x0, -1.0, jnp.maximum(w - 1.0, 0.0))
    # HBM arrays are padded by 1 leading / PATCH trailing cells, so index
    # y0+1 in the padded array == image row y0.
    y0i = (y0 + 1.0).astype(jnp.int32)
    x0i = (x0 + 1.0).astype(jnp.int32)

    fgeom = jnp.stack(
        [
            y1 - y0, x1 - x0, bin_h, bin_w,
            -1.0 - y0, h - y0, -1.0 - x0, w - x0,
        ],
        axis=1,
    ).astype(jnp.float32)
    return lvl.astype(jnp.int32), y0i, x0i, fgeom


def _interp_matrix(start, bin_size, lo_bound, hi_bound, out_size, ratio):
    """One-hot bilinear interpolation matrix [out_size*ratio, PATCH] plus the
    per-row validity, replicating torchvision's border rules in patch-local
    coordinates.  hi_bound is the image extent (H) in patch coords; the
    clamped last row is hi_bound - 1."""
    p = out_size * ratio
    idx = jax.lax.broadcasted_iota(jnp.float32, (p, 1), 0)
    bins = jnp.floor(idx / ratio)
    sub = idx - bins * ratio
    coord = start + bins * bin_size + (sub + 0.5) / ratio * bin_size  # [p,1]

    in_range = (coord >= lo_bound) & (coord <= hi_bound)
    c = jnp.maximum(coord, jnp.maximum(lo_bound + 1.0, 0.0))
    # clamp into the patch AND the image
    last = jnp.minimum(hi_bound - 1.0, PATCH - 1.0)
    c = jnp.minimum(c, last)
    lo = jnp.floor(c)
    at_border = lo >= last
    lo = jnp.where(at_border, last, lo)
    hi = jnp.where(at_border, last, lo + 1.0)
    lerp = jnp.where(at_border, 0.0, c - lo)

    cols = jax.lax.broadcasted_iota(jnp.float32, (p, PATCH), 1)
    m = (cols == lo) * (1.0 - lerp) + (cols == hi) * lerp
    return m * in_range


def _kernel(lvl_ref, y0_ref, x0_ref, geom_ref, f0, f1, f2, f3, out_ref,
            patch, sem, *, output_size, sampling_ratio):
    i = pl.program_id(0)
    lvl = lvl_ref[i]
    y0 = y0_ref[i]
    x0 = x0_ref[i]

    for k, f in enumerate((f0, f1, f2, f3)):
        @pl.when(lvl == k)
        def _():
            cp = pltpu.make_async_copy(
                f.at[pl.ds(y0, PATCH), pl.ds(x0, PATCH), :], patch, sem
            )
            cp.start()
            cp.wait()

    sy = geom_ref[i, 0]
    sx = geom_ref[i, 1]
    bh = geom_ref[i, 2]
    bw = geom_ref[i, 3]
    wy = _interp_matrix(sy, bh, geom_ref[i, 4], geom_ref[i, 5],
                        output_size, sampling_ratio)      # [P, PATCH]
    wx = _interp_matrix(sx, bw, geom_ref[i, 6], geom_ref[i, 7],
                        output_size, sampling_ratio)

    c = patch.shape[-1]
    pts = output_size * sampling_ratio
    pf = patch[:].astype(jnp.float32)
    tmp = jax.lax.dot_general(
        wy, pf.reshape(PATCH, PATCH * c),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(pts, PATCH, c)
    # out[x, y, c] = sum_w wx[x, w] * tmp[y, w, c]
    out = jax.lax.dot_general(
        wx, tmp,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                      # [Px, Py, C]
    r = sampling_ratio
    pooled = out.reshape(output_size, r, output_size, r, c).sum((1, 3)) / (r * r)
    out_ref[0] = jnp.swapaxes(pooled, 0, 1)                # -> [y, x, C]


@functools.partial(
    jax.jit,
    static_argnames=("output_size", "sampling_ratio", "interpret"),
)
def pallas_multilevel_roi_align(
    features: Sequence[jnp.ndarray],
    rois: jnp.ndarray,
    output_size: int,
    sampling_ratio: int = 2,
    spatial_scales: Tuple[float, ...] = (0.25, 0.125, 0.0625, 0.03125),
    interpret: bool = False,
) -> jnp.ndarray:
    """Single image: features [H_l, W_l, C] per level, rois [N, 4] ->
    [N, out, out, C] (float32)."""
    c = features[0].shape[-1]
    level_shapes = tuple((f.shape[0], f.shape[1]) for f in features)
    n = rois.shape[0]

    # pad every level: 1 leading cell (for y0 = -1 windows) and PATCH
    # trailing cells so [y0, y0+PATCH) is always in-bounds; pads are zero and
    # only ever touched with zero interpolation weight.
    padded = [
        jnp.pad(f, ((1, PATCH), (1, PATCH), (0, 0))) for f in features
    ]
    lvl, y0, x0, geom = _prep_scalars(
        rois, level_shapes, spatial_scales, output_size, sampling_ratio
    )

    kernel = functools.partial(
        _kernel, output_size=output_size, sampling_ratio=sampling_ratio
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=pl.BlockSpec(
            (1, output_size, output_size, c), lambda i, *_: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((PATCH, PATCH, c), padded[0].dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, output_size, output_size, c), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(lvl, y0, x0, geom, *padded)
    return out
