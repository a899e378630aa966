"""Tile-resident RoIAlign ADJOINT — Pallas TPU kernel (round 5).

The training step's largest single cost is the RoIAlign backward: the
exact XLA adjoint (ops/roi_align.multilevel_roi_align_adjoint) scatter-adds
~1.6M bilinear sample rows per branch and measured 50.98 ms (box 7x7,
2048 rois) + 40.75 ms (mask 14x14, 512 rois) standalone — 37% of the
250 ms phase-1 step (PERF.md round 5, tools/bench_adjoint.py).  TPU
scatters serialize per duplicate index, and training rois overlap ~13x on
average, so the scatter formulation is hopeless on this hardware.

This kernel inverts the structure the resident FORWARD kernel
(ops/pallas_roi_align_resident.py) uses: instead of scattering samples to
HBM, it accumulates whole windows into a VMEM-resident f32 tile of the
OUTPUT gradient and writes each tile to HBM exactly once.

  * The gradient pyramid is covered by DISJOINT ownership tiles of
    [64, 64] cells (per image, per level, padded up to the tile grid).
  * Each roi is duplicated into up to 2x2 instances — one per ownership
    tile its (clamped) sample footprint intersects.  The duplication is
    exact, not approximate: the per-instance interpolation matrices are
    built in BAND coordinates and a sample's one-hot column simply falls
    outside [0, 64) in every band but the one owning its clamped cell,
    so each bilinear corner lands exactly once (a corner pair straddling
    a band boundary splits across the two instances).
  * Per instance, the window gradient is the transpose of the forward's
    separable pooling: two small matmuls
        u   = wx_t^T-contraction of the pooled cotangent   [64, o, C]
        win = wy_t^T-contraction of u                      [64, 64, C]
    accumulated into the resident tile — MXU work instead of scatters.
  * Instances are sorted by tile id; a tile switch flushes the
    accumulator to its unique HBM destination.  Per-tile "cover"
    instances guarantee every tile (even roi-less ones) is written once,
    so the output buffers never hold uninitialized memory.

Semantics: identical to ``multilevel_roi_align_adjoint`` (torchvision
bilinear + border rules, mean over sampling_ratio^2 sub-samples) for
every roi whose clamped sample footprint spans at most two 64-cell bands
per axis — i.e. footprints up to >=65 cells, beyond anything the FPN
level mapper emits below aspect ratio ~5.  For more extreme outliers the
out-of-neighborhood tail samples are dropped (the resident FORWARD never
pooled those samples either — its window clamps at 48 cells).

Replaces the backward of the reference's torchvision
``roi_align``/``_C.roi_align_backward`` (CUDA atomicAdd scatter) —
/root/reference/models/matchrcnn.py:21-28 pool sites.
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

OWN = 64     # ownership tile side (cells); disjoint, so writes never overlap
MINI = 8     # instances per grid program


def _band_interp_matrix(start, bin_size, size, band0, out_size, ratio,
                        width=OWN):
    """Pooled bilinear interpolation matrix [out_size, width] in BAND
    coordinates (band0 = the band's first cell in LEVEL coordinates).

    Same index/weight rule as ops/roi_align._bilinear_params /
    _sample_axis (torchvision): in-range window [-1, size], floor clamp at
    level cell 0, border clamp at size-1; the sampling_ratio mean is
    folded in (each sub-sample row weighted 1/ratio).  Cells outside this
    band produce all-zero columns — the adjoint's band-duplication
    exactness relies on that (module docstring).

    A sibling of ops/pallas_roi_align._interp_matrix: that one clamps in
    WINDOW coordinates (the window always contains the clamped samples);
    bands do NOT contain all clamped positions, so the clamp here must
    happen in level coordinates before the band shift.
    """
    p = out_size * ratio
    idx_i = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    bins = (idx_i // ratio).astype(jnp.float32)
    sub = (idx_i % ratio).astype(jnp.float32)
    coord = start + bins * bin_size + (sub + 0.5) / ratio * bin_size

    in_range = (coord >= -1.0) & (coord <= size)
    c = jnp.maximum(coord, 0.0)
    last = size - 1.0
    lo = jnp.floor(c)
    at_border = lo >= last
    lo = jnp.where(at_border, last, lo)
    hi = jnp.where(at_border, last, lo + 1.0)
    lerp = jnp.where(at_border, 0.0, c - lo)

    cols = jax.lax.broadcasted_iota(jnp.int32, (p, width), 1)
    cols = cols.astype(jnp.float32) + band0  # band -> level coordinates
    m = (cols == lo) * (1.0 - lerp) + (cols == hi) * lerp
    m = m * in_range
    return m.reshape(out_size, ratio, width).sum(1) * (1.0 / ratio)


def _adj_kernel(tile_ref, roi_ref, tlvl_ref, tdr_ref, tdc_ref, tr0_ref,
                tc0_ref, geom_ref, g_ref, o2, o3, o4, o5, acc, gbuf,
                gsem, wsem, *, output_size, sampling_ratio, c, n_tiles,
                highest, emulate_bf16):
    i = pl.program_id(0)
    o = output_size
    outs = (o2, o3, o4, o5)

    # issue the group's cotangent DMAs up-front (skip/cover instances
    # fetch roi 0 — harmless read, their compute is predicated off)
    for k in range(MINI):
        j = i * MINI + k
        src = jnp.maximum(roi_ref[j], 0)
        pltpu.make_async_copy(
            g_ref.at[src], gbuf.at[k], gsem.at[k]).start()

    def flush(prev):
        """Write the finished tile to its unique HBM slot (sync: the
        disjoint-ownership grid has few tiles, ~130 at training geometry,
        so serial ~16 us writes cost ~2 ms; double-buffering is the
        follow-up lever if profiles show it)."""
        lv = tlvl_ref[prev]
        # destinations are OWN-aligned by construction (_tile_tables);
        # Mosaic requires the divisibility stated explicitly for dynamic
        # offsets (same pattern as the forward kernel's trow/tcol)
        dr = pl.multiple_of(tdr_ref[prev], 8)
        dc = pl.multiple_of(tdc_ref[prev] * c, 128)
        for lvv, oref in enumerate(outs):
            @pl.when(lv == lvv)
            def _(oref=oref):
                cp = pltpu.make_async_copy(
                    acc,
                    oref.at[pl.ds(dr, OWN), pl.ds(dc, OWN * c)],
                    wsem)
                cp.start()
                cp.wait()

    for k in range(MINI):
        j = i * MINI + k
        tid = tile_ref[j]
        prevj = jnp.maximum(j - 1, 0)
        prev = tile_ref[prevj]
        switch = jnp.logical_or(j == 0, tid != prev)

        @pl.when(jnp.logical_and(switch, jnp.logical_and(j > 0,
                                                         prev < n_tiles)))
        def _():
            flush(prev)

        @pl.when(jnp.logical_and(switch, tid < n_tiles))
        def _():
            acc[...] = jnp.zeros((OWN, OWN * c), jnp.float32)

        # drain the instance's g-DMA UNCONDITIONALLY: every program issues
        # MINI copies up-front, so every semaphore must be waited exactly
        # once per program or the kernel exits with nonzero semaphores
        # (skip/cover instances fetched roi 0 — the value is unused)
        pltpu.make_async_copy(
            g_ref.at[jnp.maximum(roi_ref[j], 0)], gbuf.at[k],
            gsem.at[k]).wait()

        @pl.when(jnp.logical_and(roi_ref[j] >= 0, tid < n_tiles))
        def _():
            r0 = tr0_ref[tid].astype(jnp.float32)
            c0 = tc0_ref[tid].astype(jnp.float32)
            wy = _band_interp_matrix(
                geom_ref[k, 0], geom_ref[k, 1], geom_ref[k, 4], r0,
                o, sampling_ratio)
            wx = _band_interp_matrix(
                geom_ref[k, 2], geom_ref[k, 3], geom_ref[k, 5], c0,
                o, sampling_ratio)
            # g rows are padded o*o -> o_pad*o (zeros; Mosaic DMA sublane
            # extents must be 8-aligned): view as [o_pad, o, c] where rows
            # oy >= o are zero, and pad wy with matching zero rows — the
            # extra contraction terms are exactly zero.
            o_pad = gbuf.shape[1] // o
            g3 = gbuf[k].reshape(o_pad, o, c)
            wy = jnp.concatenate(
                [wy, jnp.zeros((o_pad - o, OWN), jnp.float32)], axis=0)
            # Precision mirrors the FORWARD kernel's rule (an adjoint has
            # no business being more precise than the forward it pairs
            # with): f32 features -> HIGHEST (6-pass f32, bit-matching
            # summands vs the exact adjoint); bf16 features -> single
            # bf16 MXU passes with f32 accumulation.  Measured: HIGHEST
            # costs ~3x on the dominant [64, OWN*C] matmul (PERF.md r5).
            if highest:
                prec = jax.lax.Precision.HIGHEST
                u_cast = lambda x: x
            elif emulate_bf16:
                # interpret mode (CPU) cannot execute bf16xbf16 dots —
                # model the same rounding with f32 round-trips
                prec = None
                rt = lambda x: x.astype(jnp.bfloat16).astype(jnp.float32)
                wy, wx, g3 = rt(wy), rt(wx), rt(g3)
                u_cast = rt
            else:
                prec = None
                wy = wy.astype(jnp.bfloat16)
                wx = wx.astype(jnp.bfloat16)
                u_cast = lambda x: x.astype(jnp.bfloat16)
            # u[x_cell, oy_pad, c] = sum_ox wx[ox, x_cell] * g[oy, ox, c]
            u = jax.lax.dot_general(
                wx, g3, dimension_numbers=(((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)
            # win[y_cell, x_cell, c] = sum_oy wy[oy, y_cell] * u[x, oy, c]
            win = jax.lax.dot_general(
                wy, u_cast(u),
                dimension_numbers=(((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)
            acc[...] = acc[...] + win.reshape(OWN, OWN * c)

    # final flush: the instance stream always ends with >=MINI sentinel
    # slots (tid == n_tiles), so the last REAL tile is flushed by its
    # switch; nothing to do here by construction.


def _tile_tables(level_shapes, b):
    """Static enumeration of ownership tiles in (lvl, img, ty, tx) order.
    Returns int32 arrays (lvl, dest_row, dest_col_cells, r0, c0) plus the
    per-level (base, nty, ntx, hp, wp) used by the vectorized prep."""
    lvl_l, dr_l, dc_l, r0_l, c0_l = [], [], [], [], []
    base, nty_l, ntx_l, hp_l, wp_l = [], [], [], [], []
    for (h, w) in level_shapes:
        hp = -(-h // OWN) * OWN
        wp = -(-w // OWN) * OWN
        nty, ntx = hp // OWN, wp // OWN
        base.append(len(lvl_l))
        nty_l.append(nty)
        ntx_l.append(ntx)
        hp_l.append(hp)
        wp_l.append(wp)
        for img in range(b):
            for ty in range(nty):
                for tx in range(ntx):
                    lvl_l.append(len(base) - 1)
                    dr_l.append(img * hp + ty * OWN)
                    dc_l.append(tx * OWN)
                    r0_l.append(ty * OWN)
                    c0_l.append(tx * OWN)
    arrs = tuple(np.asarray(a, np.int32)
                 for a in (lvl_l, dr_l, dc_l, r0_l, c0_l))
    return arrs, (np.asarray(base, np.int32), np.asarray(nty_l, np.int32),
                  np.asarray(ntx_l, np.int32), hp_l, wp_l)


@functools.partial(
    jax.jit,
    static_argnames=("level_shapes", "output_size", "sampling_ratio",
                     "spatial_scales", "canonical_scale", "canonical_level",
                     "interpret", "highest"))
def multilevel_roi_align_adjoint_pallas(
    g: jnp.ndarray,
    rois: jnp.ndarray,
    level_shapes: Tuple[Tuple[int, int], ...],
    output_size: int,
    sampling_ratio: int = 2,
    spatial_scales: Tuple[float, ...] = (0.25, 0.125, 0.0625, 0.03125),
    canonical_scale: float = 224.0,
    canonical_level: int = 4,
    interpret: bool | str = "auto",
    highest: bool = True,
) -> Tuple[jnp.ndarray, ...]:
    """Batched resident-tile adjoint: g [B, R, o, o, C] f32 cotangents,
    rois [B, R, 4] -> per-level [B, H, W, C] f32 feature gradients.

    interpret="auto" compiles on TPU and falls back to interpret mode on
    other backends (the repo-wide pallas pattern), so the trainable
    wrappers' CPU tests exercise the same code path.

    See module docstring for the semantics contract vs the exact
    ``multilevel_roi_align_adjoint`` (bit-matching summands; f32
    accumulation order differs, and >2-band outlier tails drop).
    """
    if interpret == "auto":
        interpret = jax.default_backend() != "tpu"
    b, nr = rois.shape[:2]
    o = output_size
    c = g.shape[-1]
    cpad = (-c) % 128 if not interpret else 0
    if cpad:
        g = jnp.pad(g, ((0, 0), (0, 0), (0, 0), (0, 0), (0, cpad)))
    cc = c + cpad
    n = b * nr
    rois_f = rois.reshape(n, 4).astype(jnp.float32)
    img = jnp.repeat(jnp.arange(b, dtype=jnp.int32), nr)
    # pad the flattened o*o sample rows so the per-instance DMA's sublane
    # extent is 8-aligned (o=7 -> 8x7=56 rows, o=14 -> 16x14=224); the
    # kernel folds the zero rows into the wy contraction
    o_pad = o
    while (o_pad * o) % 8:
        o_pad += 1
    # bf16 cotangent buffer in the fast-precision mode: halves the
    # per-instance DMA bytes AND feeds the MXU its native input width
    # (interpret mode keeps f32 buffers and emulates the rounding — the
    # CPU dot thunk cannot execute bf16 x bf16 = f32)
    gdt = jnp.float32 if (highest or interpret) else jnp.bfloat16
    g2 = g.reshape(n, o * o, cc).astype(gdt)
    if o_pad > o:
        g2 = jnp.pad(g2, ((0, 0), (0, (o_pad - o) * o), (0, 0)))

    (tlvl, tdr, tdc, tr0, tc0), (base, nty, ntx, hp_l, wp_l) = \
        _tile_tables(level_shapes, b)
    n_tiles = tlvl.shape[0]

    heights = jnp.asarray([s[0] for s in level_shapes], jnp.float32)
    widths = jnp.asarray([s[1] for s in level_shapes], jnp.float32)
    scales = jnp.asarray(spatial_scales, jnp.float32)
    lvl = fpn_level_indices(rois_f, len(level_shapes), canonical_scale,
                            canonical_level)
    sc = scales[lvl]
    h = heights[lvl]
    w = widths[lvl]
    x1 = rois_f[:, 0] * sc
    y1 = rois_f[:, 1] * sc
    bin_h = jnp.maximum(rois_f[:, 3] * sc - y1, 1.0) / o
    bin_w = jnp.maximum(rois_f[:, 2] * sc - x1, 1.0) / o

    def cell_span(start, binsz, size):
        first = start + (0.5 / sampling_ratio) * binsz
        last = start + (o - 1) * binsz + \
            ((sampling_ratio - 0.5) / sampling_ratio) * binsz
        cmin = jnp.floor(jnp.clip(first, 0.0, size - 1.0)).astype(jnp.int32)
        cmax = jnp.minimum(
            jnp.floor(jnp.clip(last, 0.0, size - 1.0)).astype(jnp.int32) + 1,
            (size - 1.0).astype(jnp.int32))
        return cmin // OWN, cmax // OWN

    ty0, ty_last = cell_span(y1, bin_h, h)
    tx0, tx_last = cell_span(x1, bin_w, w)

    # per-roi geometry rows (band shifts happen in-kernel from the tile
    # tables): [y1, bin_h, x1, bin_w, h, w, 0, 0]
    geom = jnp.stack(
        [y1, bin_h, x1, bin_w, h, w,
         jnp.zeros_like(y1), jnp.zeros_like(y1)], axis=1)

    base_j = jnp.asarray(base)[lvl]
    nty_j = jnp.asarray(nty)[lvl]
    ntx_j = jnp.asarray(ntx)[lvl]
    insts_tile, insts_roi = [], []
    roi_ids = jnp.arange(n, dtype=jnp.int32)
    for dy in (0, 1):
        for dx in (0, 1):
            ty = ty0 + dy
            tx = tx0 + dx
            valid = (ty <= ty_last) & (tx <= tx_last)
            tid = base_j + (img * nty_j + ty) * ntx_j + tx
            insts_tile.append(jnp.where(valid, tid, n_tiles))
            insts_roi.append(jnp.where(valid, roi_ids, -1))
    # cover instances: every tile appears at least once, so every output
    # tile gets zeroed + written exactly once (no uninitialized memory)
    insts_tile.append(jnp.arange(n_tiles, dtype=jnp.int32))
    insts_roi.append(jnp.full((n_tiles,), -1, jnp.int32))
    inst_tile = jnp.concatenate(insts_tile)
    inst_roi = jnp.concatenate(insts_roi)
    ni = inst_tile.shape[0]
    ni_pad = -(-ni // MINI) * MINI + MINI  # >= MINI trailing sentinels
    inst_tile = jnp.pad(inst_tile, (0, ni_pad - ni),
                        constant_values=n_tiles)
    inst_roi = jnp.pad(inst_roi, (0, ni_pad - ni), constant_values=-1)

    order = jnp.argsort(inst_tile, stable=True)
    inst_tile = inst_tile[order].astype(jnp.int32)
    inst_roi = inst_roi[order].astype(jnp.int32)
    inst_geom = geom[jnp.maximum(inst_roi, 0)]

    out_shapes = [
        jax.ShapeDtypeStruct((b * hp, wp * cc), jnp.float32)
        for hp, wp in zip(hp_l, wp_l)
    ]
    kernel = functools.partial(
        _adj_kernel, output_size=o, sampling_ratio=sampling_ratio, c=cc,
        n_tiles=n_tiles, highest=highest, emulate_bf16=bool(interpret))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(ni_pad // MINI,),
        in_specs=[
            pl.BlockSpec((MINI, 8), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
        scratch_shapes=[
            pltpu.VMEM((OWN, OWN * cc), jnp.float32),
            pltpu.VMEM((MINI, o_pad * o, cc), gdt),
            pltpu.SemaphoreType.DMA((MINI,)),
            pltpu.SemaphoreType.DMA,
        ],
    )
    bufs = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        grid_spec=grid_spec,
        interpret=interpret,
    )(inst_tile, inst_roi, jnp.asarray(tlvl), jnp.asarray(tdr),
      jnp.asarray(tdc), jnp.asarray(tr0), jnp.asarray(tc0), inst_geom, g2)

    outs = []
    for buf, (hh, ww), hp, wp in zip(bufs, level_shapes, hp_l, wp_l):
        a = buf.reshape(b, hp, wp, cc)[:, :hh, :ww, :c]
        outs.append(a)
    return tuple(outs)
