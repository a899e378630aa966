"""Pallas RoIAlign: per-roi patch DMA + separable one-hot interpolation.

The XLA gather formulation of RoIAlign (ops/roi_align.py) is
bandwidth-correct but gather-throughput-bound on TPU (~14 µs/roi measured —
dominating the whole detector).  This kernel restructures the op around the
hardware:

  * each roi DMAs a contiguous [PATCH, PATCH_W, C] window of its FPN level
    from HBM into VMEM (the FPN level mapper bounds a roi's footprint at its
    level to ≈14–28 feature cells per sqrt-area side, so the start-aligned
    window covers footprints to ~39.5 cells — aspect ratios < 2.0 at the
    very top of the band, < 2.7 mid-band, everything below
    (measured: PERF.md "patch-clamp quantification");
    larger-footprint outliers clamp to the patch edge — documented
    approximation; the XLA gather path stays exact and is the default for
    training, while serving_model_config selects this kernel: ~3.8× serving
    throughput end-to-end on the dev chip, see PERF.md).  The transfer is
    split at the SPLITS row boundaries: pieces past the roi's vertical
    footprint never move (~55% of serving rois skip rows >= 24 exactly —
    zero interp weight there), and the pooling matmul + its wc expansion
    shrink to the first boundary covering the footprint (gate_matmul),
    cutting MXU K and VPU work above the DMA floor;
  * bilinear sampling + the sampling_ratio² average pool become ONE MXU
    matmul with the combined Kronecker pooling operator built on the VPU:
        out = (W_y ⊗ W_x) @ patch    [out², PATCH·PATCH_W] @ [PATCH·PATCH_W, C]
    (pool folded into the one-hot interpolation matrices; measured faster
    than the separable two-matmul form, whose M=7 wastes MXU rows);
  * per-roi DMA addresses (image, level, window origin, footprint rows)
    arrive via scalar prefetch; the float sample-grid geometry streams
    through VMEM.  The batch dimension is folded into the grid (one program
    per roi across the whole batch) and rois are chunked so the prefetch
    arrays stay within SMEM.

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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .roi_align import fpn_level_indices

PATCH = 40      # patch rows (H; untiled dim, no alignment constraint)
PATCH_W = 48    # patch cols: 40 + 8 slack so the HBM slice start can be
                # 8-aligned (Mosaic requires tiled-dim DMA offsets divisible
                # by the sublane tiling)
ROWS0 = 24      # rows in the unconditional DMA piece; rows [ROWS0, PATCH)
                # transfer only when the roi's vertical footprint needs them
                # (exact: the interpolation matrix is zero past the footprint,
                # and stale scratch rows are finite feature values, so
                # 0-weight x stale contributes exactly 0).  ~55% of serving
                # rois skip the tail -> ~20% fewer bytes on a DMA-byte-bound
                # kernel (PERF.md).
SPLITS = (16, 24, 32)  # default piece boundaries.  Row-gating the DMA alone
                # was insensitive to the split choice (PERF.md round-2 scan:
                # best 0.7% ~= noise), but with gate_matmul the pooling
                # matmul's K and the wc expansion shrink to the first
                # boundary >= the footprint, and finer pieces pay: measured
                # (16,24,32) 1.837 us/roi vs (24) 1.929 vs ungated 2.151 at
                # the serving roi mix (tools/exp_matmul_gate.py,
                # tools/exp_row_splits.py).
ROI_CHUNK = 2048  # rois per pallas_call (bounds the SMEM prefetch arrays)


def _prep_scalars(rois, level_shapes, spatial_scales, output_size):
    """Per-roi DMA/geometry scalars for a flat [N, 4] roi array.

    Returns (lvl [N], y0 [N], x0 [N] int32, fgeom [N, 8] f32) with fgeom
    rows (sy, sx, bin_h, bin_w, ymin, ymax, xmin, xmax): sample-grid origin
    and bin sizes in patch-local feature units plus in-range/clamp bounds of
    the image in the patch frame.
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

    # patch origin: start-aligned just above the first sample (centering
    # would waste half the span budget) — covers footprints up to ~37 rows /
    # ~38 cols after the alignment slack
    y0 = jnp.floor(y1) - 1.0
    x0 = jnp.floor(x1) - 1.0
    y0 = jnp.clip(y0, -1.0, jnp.maximum(h - 1.0, 0.0))
    x0 = jnp.clip(x0, -1.0, jnp.maximum(w - 1.0, 0.0))
    # HBM arrays are padded by 1 leading / PATCH(_W) trailing cells, so
    # index y0+1 in the padded array == image row y0.  The W (tiled) DMA
    # offset must be 8-aligned: round the padded start down and absorb the
    # shift into the sample-grid origin.
    y0i = (y0 + 1.0).astype(jnp.int32)
    x0p = ((x0 + 1.0).astype(jnp.int32) // 8) * 8
    x0 = x0p.astype(jnp.float32) - 1.0

    fgeom = jnp.stack(
        [
            y1 - y0, x1 - x0, bin_h, bin_w,
            -1.0 - y0, h - y0, -1.0 - x0, w - x0,
        ],
        axis=1,
    ).astype(jnp.float32)
    # Last patch row the sample grid can touch: the max sample coordinate is
    # start + out*bin_h (roi bottom edge); bilinear reads floor(c)+1, border
    # clamping only lowers c.  +2 covers the floor+1 and the ceil.
    nrows = jnp.clip(
        jnp.ceil(y1 - y0 + output_size * bin_h).astype(jnp.int32) + 2,
        1, PATCH,
    )
    return lvl.astype(jnp.int32), y0i, x0p, nrows, fgeom


def footprint_clamp_mask(
    rois: jnp.ndarray,
    level_shapes: Sequence[Tuple[int, int]],
    spatial_scales: Sequence[float] = (0.25, 0.125, 0.0625, 0.03125),
    output_size: int = 7,
    sampling_ratio: int = 2,
) -> jnp.ndarray:
    """Per-roi mask of the kernel's patch-window approximation.

    True where the [PATCH, PATCH_W] window cannot cover the roi's bilinear
    sample footprint at its FPN level, i.e. where ``pallas_roi_align``
    clamps samples at the patch edge and diverges from the exact kernel
    (torchvision semantics, /root/reference/models/matchrcnn.py:21-28).
    Mirrors ``_prep_scalars`` exactly; rois whose overflow lies beyond the
    image border are NOT flagged (both kernels clamp identically there).

    Used to (a) quantify the approximation on a roi distribution
    (tools/measure_roi_clamp.py, PERF.md) and (b) drive the exact-fixup
    escape hatch in ``pallas_roi_align_fixup``.
    """
    # Derive the geometry from _prep_scalars itself — the mask gates the
    # exact-fixup escape hatch, so it must be impossible for it to drift
    # from the kernel's window-origin/alignment math.
    shape = rois.shape[:-1]
    _lvl, _y0i, _x0p, _nrows, fgeom = _prep_scalars(
        rois.reshape(-1, 4), level_shapes, spatial_scales, output_size)
    sy, sx = fgeom[:, 0], fgeom[:, 1]          # y1 - y0, x1 - x0
    bin_h, bin_w = fgeom[:, 2], fgeom[:, 3]
    ymax, xmax = fgeom[:, 5], fgeom[:, 7]      # h - y0, w - x0

    # last sub-sample coordinate along each axis (patch-local):
    # start + (out-1)*bin + (ratio-0.5)/ratio*bin
    cy = sy + output_size * bin_h - bin_h * 0.5 / sampling_ratio
    cx = sx + output_size * bin_w - bin_w * 0.5 / sampling_ratio
    # image border (exact semantics clamp here too -> not an approximation)
    cy = jnp.minimum(cy, ymax - 1.0)
    cx = jnp.minimum(cx, xmax - 1.0)
    # bilinear reads floor(c)+1: exact while c <= width-1
    return ((cy > PATCH - 1.0) | (cx > PATCH_W - 1.0)).reshape(shape)


def _interp_matrix(start, bin_size, lo_bound, hi_bound, out_size, ratio, width,
                   clamp_last=None):
    """One-hot bilinear interpolation matrix [out_size*ratio, width] with
    torchvision's border rules in patch-local coordinates.

    ``clamp_last`` (dynamic scalar, default ``width - 1``) is the patch-edge
    sample clamp; the resident kernel's window is wider than the production
    patch, so it passes the production clamp shifted by its row-alignment
    residual to keep the two kernels' out-of-contract behavior identical."""
    p = out_size * ratio
    idx_i = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    bins = (idx_i // ratio).astype(jnp.float32)
    sub = (idx_i % ratio).astype(jnp.float32)
    coord = start + bins * bin_size + (sub + 0.5) / ratio * bin_size  # [p,1]

    in_range = (coord >= lo_bound) & (coord <= hi_bound)
    c = jnp.maximum(coord, jnp.maximum(lo_bound + 1.0, 0.0))
    if clamp_last is None:
        clamp_last = width - 1.0
    last = jnp.minimum(hi_bound - 1.0, clamp_last)  # image border or patch edge
    c = jnp.minimum(c, last)
    lo = jnp.floor(c)
    at_border = lo >= last
    lo = jnp.where(at_border, last, lo)
    hi = jnp.where(at_border, last, lo + 1.0)
    lerp = jnp.where(at_border, 0.0, c - lo)

    cols = jax.lax.broadcasted_iota(jnp.int32, (p, width), 1).astype(jnp.float32)
    m = (cols == lo) * (1.0 - lerp) + (cols == hi) * lerp
    m = m * in_range
    # Fold the sampling_ratio average pool into the matrix: the pooled output
    # is the mean of the ratio sub-samples per bin, which is linear, so the
    # pooled interp matrix is just the mean of each bin's sub-sample rows.
    # Halves both matmul shapes and removes the pool reshape from the kernel.
    return m.reshape(out_size, ratio, width).sum(1) * (1.0 / ratio)


MINI = 8  # max rois per grid program: all MINI patch DMAs issued up-front
          # (latency amortized), computes run back-to-back


def _pick_mini(c, itemsize):
    """Rois per grid program, bounded so the patch scratch stays within the
    ~16 MB scoped-VMEM limit (f32 x 256ch patches OOM at MINI=8)."""
    budget = 8 * 1024 * 1024
    m = max(1, min(MINI, budget // (PATCH * PATCH_W * c * itemsize)))
    while MINI % m:
        m -= 1
    return m


def quantize_features_int8(features: Sequence[jnp.ndarray]):
    """Per-level, per-channel symmetric int8 quantization of an FPN pyramid.

    Returns (q_features, scales[L, C] f32) with f ≈ q * scale.  Halves the
    HBM bytes of the bandwidth-bound patch DMA (PERF.md: RoIAlign reads
    ~1 MB/roi at ~80% of the HBM ceiling); the dequant multiply is fused
    after the pooling matmuls inside the kernel.  Quantization noise is
    ≤ maxabs/254 per channel — an approximate serving profile
    (roi_align_backend="pallas_int8"), exact paths remain the default.
    """
    qs, scales = [], []
    for f in features:
        m = jnp.max(jnp.abs(f.astype(jnp.float32)), axis=tuple(range(f.ndim - 1)))
        s = jnp.maximum(m, 1e-12) / 127.0
        q = jnp.clip(jnp.round(f.astype(jnp.float32) / s), -127, 127)
        qs.append(q.astype(jnp.int8))
        scales.append(s)
    return qs, jnp.stack(scales)


def _kernel(img_ref, lvl_ref, y0_ref, x0_ref, nrows_ref, geom_ref,
            f0, f1, f2, f3, *rest,
            output_size, sampling_ratio, dequant, mini, splits, gate_matmul):
    if dequant:
        scales_ref, out_ref, patch, sems = rest
    else:
        out_ref, patch, sems = rest
    i = pl.program_id(0)
    refs = (f0, f1, f2, f3)
    bounds = (0,) + tuple(splits) + (PATCH,)
    n_pieces = len(bounds) - 1

    for k in range(mini):
        j = i * mini + k
        img = img_ref[j]
        lvl = lvl_ref[j]
        y0 = y0_ref[j]
        x0 = pl.multiple_of(x0_ref[j], 8)
        nr = nrows_ref[j]
        for lv, f in enumerate(refs):
            # Piece 0 always transfers; pieces beyond a split row move only
            # when the roi's vertical footprint reaches them.  Skipped
            # pieces leave stale-but-finite rows that the zero interp
            # weights cancel exactly; program 0 always transfers every
            # piece so a fresh (possibly NaN-bit-pattern) scratch never
            # reaches the MXU (0 x NaN = NaN).
            for pi in range(n_pieces):
                lo, hi = bounds[pi], bounds[pi + 1]
                cond = (lvl == lv) if pi == 0 else (
                    (lvl == lv) & ((nr > lo) | (i == 0)))

                @pl.when(cond)
                def _(f=f, lo=lo, hi=hi, pi=pi, img=img, y0=y0, x0=x0, k=k):
                    pltpu.make_async_copy(
                        f.at[img, pl.ds(y0 + lo, hi - lo),
                             pl.ds(x0, PATCH_W), :],
                        patch.at[k, lo:hi], sems.at[pi, k],
                    ).start()

    o = output_size
    c = patch.shape[-1]
    for k in range(mini):
        for pi in range(n_pieces):
            lo, hi = bounds[pi], bounds[pi + 1]
            if pi == 0:
                pltpu.make_async_copy(
                    f0.at[0, pl.ds(0, hi - lo), pl.ds(0, PATCH_W), :],
                    patch.at[k, lo:hi], sems.at[pi, k],
                ).wait()
            else:
                @pl.when((nrows_ref[i * mini + k] > lo) | (i == 0))
                def _(lo=lo, hi=hi, pi=pi, k=k):
                    pltpu.make_async_copy(
                        f0.at[0, pl.ds(0, hi - lo), pl.ds(0, PATCH_W), :],
                        patch.at[k, lo:hi], sems.at[pi, k],
                    ).wait()
        # pool-folded interp matrices: [out, PATCH] / [out, PATCH_W]
        wy = _interp_matrix(geom_ref[k, 0], geom_ref[k, 2], geom_ref[k, 4],
                            geom_ref[k, 5], o, sampling_ratio, PATCH)
        wx = _interp_matrix(geom_ref[k, 1], geom_ref[k, 3], geom_ref[k, 6],
                            geom_ref[k, 7], o, sampling_ratio, PATCH_W)
        # Combined Kronecker pooling operator wc[(oy,ox),(py,px)] =
        # wy[oy,py]·wx[ox,px]: ONE [o², PATCH·PATCH_W] @ [PATCH·PATCH_W, C]
        # matmul instead of two M=7 matmuls + a [7,7,C] swapaxes — 7× the
        # M-rows per MXU pass and one issue slot; measured faster than the
        # separable pair on a DMA-bound kernel (PERF.md).  Built with
        # concats (Mosaic cannot shape-cast the 4D outer product, and
        # pltpu.repeat has tile semantics).
        dn = (((1,), (0,)), ((), ()))
        pdt = jnp.dtype(patch.dtype)
        if pdt == jnp.bfloat16:
            # bf16 construction halves the VPU bytes of the expansion; the
            # wy/wx entries already round to bf16 at the MXU anyway.
            wy, wx = wy.astype(jnp.bfloat16), wx.astype(jnp.bfloat16)
        wyR = jnp.concatenate(
            [jnp.broadcast_to(wy[t:t + 1], (o, PATCH)) for t in range(o)], 0)
        wxR = jnp.concatenate([wx] * o, axis=0)            # [o², PATCH_W]

        def pool_rows(rows_used, k=k):
            # wy columns [nr, PATCH) are exactly zero (the invariant behind
            # the tail-DMA gating), so a roi with nr <= rows_used pools
            # identically from the first rows_used patch rows — smaller K on
            # the MXU and fewer VPU expansion concats.
            wc = jnp.concatenate(
                [wyR[:, py:py + 1] * wxR for py in range(rows_used)], axis=1)
            pm = patch[k][:rows_used].reshape(rows_used * PATCH_W, c)
            # The MXU truncates f32 operands to bf16 at default precision;
            # keep f32 inputs exact via Precision.HIGHEST.
            if pdt == jnp.int8:
                # int8 x int8 MXU path: quantize the pooling operator to
                # int8 (entries in [0, 1], global scale 127) so the
                # DMA-halving int8 pyramid is not throttled by a VPU
                # int8->bf16 patch cast.  Extra error <= 0.5/127 per weight
                # entry (documented in the int8 drift test); the int8
                # profile is approximate by contract.
                wq = jnp.clip(jnp.round(wc * 127.0), -127.0,
                              127.0).astype(jnp.int8)
                pooled = jax.lax.dot_general(
                    wq, pm, dimension_numbers=dn,
                    preferred_element_type=jnp.int32,
                ).astype(jnp.float32) * (1.0 / 127.0)      # [o², C]
            elif pdt == jnp.float32:
                pooled = jax.lax.dot_general(
                    wc, pm, dimension_numbers=dn,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
            else:
                # bf16 patches feed the MXU directly (casting the
                # ~0.5M-element patch on the VPU costs more than the
                # matmul).
                pooled = jax.lax.dot_general(
                    wc.astype(jnp.bfloat16), pm, dimension_numbers=dn,
                    preferred_element_type=jnp.float32,
                )
            if dequant:
                pooled = pooled * scales_ref[lvl_ref[i * mini + k]]
            # out_dtype=bf16 rounds here instead of in a separate 2.2 GB
            # cast op after the kernel (the serving box head computes in
            # bf16 anyway — identical values, half the HBM traffic)
            out_ref[k] = pooled.reshape(o, o, c).astype(out_ref.dtype)

        row_opts = list(bounds[1:])
        if not gate_matmul or len(row_opts) == 1:
            pool_rows(PATCH)
        else:
            # One branch per piece boundary, mutually exclusive + exhaustive
            # on nr ∈ [1, PATCH]; every row < the selected boundary is
            # DMA-fresh by the piece-gating conditions above.
            nr_k = nrows_ref[i * mini + k]
            for bi, ru in enumerate(row_opts):
                if bi == 0:
                    cond = nr_k <= ru
                elif bi == len(row_opts) - 1:
                    cond = nr_k > row_opts[bi - 1]
                else:
                    cond = (nr_k > row_opts[bi - 1]) & (nr_k <= ru)
                pl.when(cond)(functools.partial(pool_rows, ru))


@functools.partial(
    jax.jit,
    static_argnames=("output_size", "sampling_ratio", "interpret", "roi_chunk",
                     "splits", "gate_matmul", "out_dtype"),
)
def pallas_roi_align_batched(
    features: Sequence[jnp.ndarray],
    rois: jnp.ndarray,
    output_size: int,
    sampling_ratio: int = 2,
    spatial_scales: Tuple[float, ...] = (0.25, 0.125, 0.0625, 0.03125),
    interpret: bool | str = "auto",
    roi_chunk: int = ROI_CHUNK,
    scales: jnp.ndarray | None = None,
    splits: Tuple[int, ...] = SPLITS,
    gate_matmul: bool = True,
    out_dtype=jnp.float32,
) -> jnp.ndarray:
    """Batched multi-level RoIAlign.

    features: per level [B, H_l, W_l, C]; rois: [B, R, 4] in image coords.
    With int8 features pass ``scales`` [L, C] from quantize_features_int8;
    the kernel dequantizes after pooling.  Returns [B, R, out, out, C] in
    ``out_dtype`` (pooling accumulates f32 regardless; out_dtype=bf16
    rounds at the store — bit-identical to a post-kernel cast but without
    materializing the f32 array: ~50 KB/roi of HBM writes+reads saved on
    the serving box branch).
    interpret="auto" compiles on TPU and falls back to interpret mode on
    other backends (so CPU tests exercise the same code path).
    """
    if interpret == "auto":
        interpret = jax.default_backend() != "tpu"
    b, r = rois.shape[:2]
    c = features[0].shape[-1]
    level_shapes = tuple((f.shape[1], f.shape[2]) for f in features)

    # Mosaic requires DMA slice extents on the lane (channel) dim to be
    # 128-aligned; pad small test channel counts up (serving C=256 is
    # untouched) and slice the pooled output back at the end.
    cpad = max(0, -c % 128)
    padded = [jnp.pad(f, ((0, 0), (1, PATCH), (1, PATCH_W), (0, cpad)))
              for f in features]
    if cpad and scales is not None:
        scales = jnp.pad(scales, ((0, 0), (0, cpad)))
    c += cpad

    flat_rois = rois.reshape(b * r, 4)
    img_idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), r)
    lvl, y0, x0, nrows, fgeom = _prep_scalars(
        flat_rois, level_shapes, spatial_scales, output_size
    )

    n = b * r
    pad = (-n) % roi_chunk
    if pad:
        img_idx = jnp.pad(img_idx, (0, pad))
        lvl = jnp.pad(lvl, (0, pad))
        y0 = jnp.pad(y0, (0, pad))
        x0 = jnp.pad(x0, (0, pad))
        nrows = jnp.pad(nrows, (0, pad), constant_values=1)
        fgeom = jnp.pad(fgeom, ((0, pad), (0, 0)))

    dequant = scales is not None
    mini = _pick_mini(c, jnp.dtype(padded[0].dtype).itemsize)
    assert all(0 < s < PATCH for s in splits) and list(splits) == sorted(splits)
    kernel = functools.partial(
        _kernel, output_size=output_size, sampling_ratio=sampling_ratio,
        dequant=dequant, mini=mini, splits=splits, gate_matmul=gate_matmul,
    )
    assert roi_chunk % mini == 0
    # Mosaic requires the geom block's sublane dim divisible by 8: pad each
    # mini-group of geometry rows to 8 so the block stays (8, 8).
    n_groups = (n + pad) // mini
    fgeom = fgeom.reshape(n_groups, mini, 8)
    if mini < 8:
        fgeom = jnp.pad(fgeom, ((0, 0), (0, 8 - mini), (0, 0)))
    fgeom = fgeom.reshape(n_groups * 8, 8)
    scale_specs = []
    if dequant:
        scale_specs = [pl.BlockSpec(
            scales.shape, lambda i, *_: (0, 0), memory_space=pltpu.VMEM
        )]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(roi_chunk // mini,),
        in_specs=[
            pl.BlockSpec((8, 8), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pl.ANY)] * 4 + scale_specs,
        out_specs=pl.BlockSpec(
            (mini, output_size, output_size, c), lambda i, *_: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((mini, PATCH, PATCH_W, c), padded[0].dtype),
            pltpu.SemaphoreType.DMA((len(splits) + 1, mini)),
        ],
    )
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((roi_chunk, output_size, output_size, c),
                                       out_dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )

    n_chunks = (n + pad) // roi_chunk
    chunk = lambda a: a.reshape((n_chunks, roi_chunk) + a.shape[1:])
    geom_rows = (roi_chunk // mini) * 8
    geom_chunked = fgeom.reshape(n_chunks, geom_rows, 8)

    def body(args):
        im, lv, yy, xx, nr, geom = args
        extra = (scales,) if dequant else ()
        return call(im, lv, yy, xx, nr, geom, *padded, *extra)

    outs = jax.lax.map(
        body, (chunk(img_idx), chunk(lvl), chunk(y0), chunk(x0), chunk(nrows),
               geom_chunked)
    )
    out = outs.reshape(n + pad, output_size, output_size, c)[:n]
    if cpad:
        out = out[..., : c - cpad]
    return out.reshape(b, r, output_size, output_size, c - cpad)


def apply_exact_fixup(
    features: Sequence[jnp.ndarray],
    rois: jnp.ndarray,
    out: jnp.ndarray,
    output_size: int,
    sampling_ratio: int = 2,
    budget: int = 32,
) -> jnp.ndarray:
    """Escape hatch for the patch-window approximation: re-run the EXACT
    XLA kernel on (up to ``budget``) clamped rois per image and scatter the
    results into the Pallas output.

    ``footprint_clamp_mask`` flags the rois whose bilinear footprint
    overflows the [PATCH, PATCH_W] window; those (measured ≲1e-3 of
    serving-distribution rois — tools/measure_roi_clamp.py, PERF.md) are
    recomputed with torchvision-exact semantics.  Static shapes: the
    top-``budget`` flagged rois per image are fixed; overflow beyond the
    budget stays approximate (count is observable host-side via the mask).

    features: per level [B, H, W, C]; rois [B, R, 4]; out [B, R, o, o, C].
    """
    from .roi_align import batched_multilevel_roi_align

    b, r = rois.shape[:2]
    k = min(budget, r)
    if k <= 0:
        return out
    level_shapes = tuple((f.shape[1], f.shape[2]) for f in features[:4])
    mask = footprint_clamp_mask(
        rois.reshape(b * r, 4), level_shapes,
        output_size=output_size, sampling_ratio=sampling_ratio,
    ).reshape(b, r)
    score, idx = jax.lax.top_k(mask.astype(jnp.float32), k)  # [B, K]
    sub_rois = jnp.take_along_axis(rois, idx[..., None], axis=1)
    exact = batched_multilevel_roi_align(
        list(features[:4]), sub_rois, output_size,
        sampling_ratio=sampling_ratio, roi_chunk=k,
    ).astype(out.dtype)
    cur = out[jnp.arange(b)[:, None], idx]
    sel = (score > 0.0)[..., None, None, None]
    return out.at[jnp.arange(b)[:, None], idx].set(
        jnp.where(sel, exact, cur))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def pallas_roi_align_trainable(features, rois, output_size, sampling_ratio,
                               out_dtype=jnp.float32, adjoint="xla"):
    """Differentiable wrapper: Pallas patch-DMA forward + an EXACT adjoint
    as backward.  RoIAlign is linear in ``features`` for fixed rois, so
    its vjp is a fixed transpose (scatter-add) independent of the
    forward's values.  Gradients therefore match the exact kernel
    everywhere the two forwards agree (all footprints within the patch
    window).  No grad w.r.t. rois, like the detached proposals of the
    reference pipeline.

    ``adjoint``: "xla" (scatter-add, ops/roi_align) or "pallas" (the
    tile-resident adjoint kernel, ops/pallas_roi_adjoint; see PERF.md
    round 5 and RoIHeadsConfig.roi_adjoint_backend).

    features: TUPLE of per-level [B, H, W, C]; rois [B, R, 4].
    """
    return pallas_roi_align_batched(
        list(features), rois, output_size, sampling_ratio, out_dtype=out_dtype
    )


def _trainable_fwd(features, rois, output_size, sampling_ratio, out_dtype,
                   adjoint):
    out = pallas_roi_align_trainable(features, rois, output_size,
                                     sampling_ratio, out_dtype, adjoint)
    return out, (features, rois)


def _trainable_bwd(output_size, sampling_ratio, out_dtype, adjoint, res, g):
    features, rois = res
    level_shapes = tuple((f.shape[1], f.shape[2]) for f in features)
    if adjoint == "pallas":
        from .pallas_roi_adjoint import multilevel_roi_align_adjoint_pallas

        # precision follows the forward's own rule (see the resident
        # wrapper): full for f32 features, single bf16 passes for bf16
        adj = multilevel_roi_align_adjoint_pallas(
            g.astype(jnp.float32), rois, level_shapes, output_size,
            sampling_ratio,
            highest=jnp.dtype(features[0].dtype) == jnp.float32)
    else:
        from .roi_align import multilevel_roi_align_adjoint

        adj = jax.vmap(
            lambda gi, ri: multilevel_roi_align_adjoint(
                gi, level_shapes, ri, output_size, sampling_ratio
            )
        )(g, rois)
    gfeats = tuple(a.astype(f.dtype) for a, f in zip(adj, features))
    return gfeats, jnp.zeros_like(rois)


pallas_roi_align_trainable.defvjp(_trainable_fwd, _trainable_bwd)


def pallas_multilevel_roi_align(
    features: Sequence[jnp.ndarray],
    rois: jnp.ndarray,
    output_size: int,
    sampling_ratio: int = 2,
    spatial_scales: Tuple[float, ...] = (0.25, 0.125, 0.0625, 0.03125),
    interpret: bool | str = "auto",
    scales: jnp.ndarray | None = None,
    out_dtype=jnp.float32,
) -> jnp.ndarray:
    """Single-image convenience wrapper: features [H_l, W_l, C], rois [N, 4]."""
    out = pallas_roi_align_batched(
        [f[None] for f in features], rois[None], output_size, sampling_ratio,
        spatial_scales, interpret=interpret,
        roi_chunk=min(ROI_CHUNK, ((max(8, rois.shape[0]) + 7) // 8) * 8),
        scales=scales, out_dtype=out_dtype,
    )
    return out[0]
