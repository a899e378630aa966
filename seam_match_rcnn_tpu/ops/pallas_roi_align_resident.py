"""Tile-resident Pallas RoIAlign: shared VMEM tiles instead of per-roi DMA.

The production kernel (pallas_roi_align.py) DMAs a private [PATCH, PATCH_W]
HBM window per roi (~1 MB, footprint-gated).  Serving rois overlap heavily —
the UNIQUE pyramid bytes per frame are ~80× smaller than the summed windows —
and the measured per-roi floor with NO DMA at all is ~28% below the
production kernel (tools/exp_roi_resident.py: res_mm 1.324 µs/roi vs
production 1.837 µs/roi, same session).  This kernel realizes that floor:

  * the FPN pyramid is cut into [TILE_H, TILE_W] = [72, 120] cell tiles on a
    [32, 72] stride grid (halo ≥ window size ⇒ every roi window, 8-aligned
    start, lies in exactly ONE tile); levels whose raw arrays satisfy the
    DMA constraints directly (h ≡ 0 mod 8, h ≥ 72, w ≥ tile cols,
    c ≡ 0 mod 128) are addressed ZERO-COPY — edge tiles clamp into bounds
    and the per-roi geometry shifts absorb the clamp (interp weights
    outside [0, dim-1] are exactly zero, so pad VALUES were never needed) —
    which skips the ~1 GB/batch pyramid pad copy for P2 at serving
    geometry; the remaining levels keep the padded layout;
  * rois are tile-sorted (XLA argsort on a flat (image, level, ty, tx) key)
    and streamed through the kernel in that order; the kernel keeps TWO tiles
    resident in VMEM (double buffer) and, at each tile switch, waits for the
    prefetched tile and starts the DMA for the NEXT one — the per-tile DMA
    (~2.2 MB bf16) overlaps the ~100s of rois pooled from the current tile;
  * pooling is the separable two-matmul form straight off the resident tile:
        tmp    = W_y[o, 48] @ tile[y0:y0+48, x0*C:(x0+48)C]   (K = 48 rows)
        pooled = W_x[o, 48] ⋅ tmp.reshape(o, 48, C)  (contract the col dim)
    (the production kernel's combined Kronecker operator wins only when a
    per-roi DMA must be overlapped; compute-only, the separable form is
    ~8% faster and skips the O(o²·K) VPU expansion — probe table in
    PERF.md);
  * outputs are written in SORTED order and the permutation is returned.
    RoIAlign consumers (the box head) are per-roi maps, so callers run the
    head on the sorted features and unpermute the SMALL head outputs
    (logits/deltas, ~70 floats/roi) instead of the 25 KB/roi pooled
    features (models/matchrcnn.box_branch).

Window semantics are IDENTICAL to the production kernel: the same
start-aligned [PATCH=40, PATCH_W=48]-cell window contract per roi (the 8
extra tile-local rows only absorb the 8-alignment shift of the row origin,
never extend the footprint), so ``footprint_clamp_mask`` and the exact-fixup
escape hatch apply unchanged.  Reference semantics: torchvision
aligned=False via MultiScaleRoIAlign (/root/reference/models/matchrcnn.py:21-28).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_roi_align import PATCH, PATCH_W, _interp_matrix, _prep_scalars

TILE_H = 72        # resident tile rows; stride 32 ⇒ row halo 40 = PATCH
TILE_W = 120       # bf16 tile cols; stride 72 ⇒ col halo 48 = PATCH_W
ROW_STRIDE = 32
COL_STRIDE = 72
# 4-byte dtypes halve the tile width budget (two resident [72, tile_w·C]
# buffers must fit the 16 MB scoped-VMEM limit at C=256): 96-wide tiles on a
# 48 stride keep the col halo at 48 = PATCH_W.
TILE_W_F32 = 96
COL_STRIDE_F32 = 48
WIN_H = PATCH + 8  # row window read per roi: PATCH + the ≤7-row 8-alignment
                   # shift of the slice origin (slice starts at floor8(y0))
MINI = 8           # rois per grid program (geometry block sublane alignment)


def tile_geometry(itemsize: int, output_size: int) -> Tuple[int, int]:
    """(tile_w, col_stride) for the resident buffers, sized to the scoped
    16 MB VMEM limit: two [TILE_H, tile_w·C] tiles + the [MINI, o, o, C]
    f32 out block must fit.  tile_w = col_stride + PATCH_W always (col
    halo ≥ the 48-cell window ⇒ every roi window lies in ONE tile).

    * ≤2-byte dtypes: [72, 120] @ 72 (8.9 MB of tiles at C=256).
    * f32, output ≤ 7: [72, 96] @ 48 (14.2 MB — measured to compile,
      test_tpu_compiled).
    * f32, output > 7: [72, 80] @ 32 — the 4× larger out block (1.6 MB at
      o=14, C=256) pushed the 96-wide layout to 17.04 MB > 16 scoped
      (compile-time VMEM OOM, found by the phase-1 synthetic CLI smoke:
      f32 compute + resident backend + mask_roi(14)); narrowing to 80
      costs more tile DMAs only on the small f32 mask/match streams.
    """
    if itemsize <= 2:
        return TILE_W, COL_STRIDE
    if output_size <= 7:
        return TILE_W_F32, COL_STRIDE_F32
    return 80, 32


def tile_sort_keys(lvl, y0i, x0p, img_idx, level0_shape, wide=True,
                   col_stride=None):
    """Per-roi flat (image, level, tile-row, tile-col) sort key + tile coords.

    This IS the kernel's tile assignment (4-level FPN).  Plain array math —
    works on numpy or jnp inputs — so host-side analyses
    (tools/analyze_resident_runs.py) share it and cannot drift from the
    compiled kernel's run structure.  ``wide``: bf16 [72, 120] tiles on a
    72-col stride; 4-byte dtypes use [72, 96] on a 48-col stride (or
    [72, 80] @ 32 for >7 output sizes — pass ``col_stride`` explicitly to
    match ``tile_geometry``).
    """
    if col_stride is None:
        col_stride = COL_STRIDE if wide else COL_STRIDE_F32
    ty = y0i // ROW_STRIDE
    tx = x0p // col_stride
    maxty = level0_shape[0] // ROW_STRIDE + 1
    maxtx = level0_shape[1] // col_stride + 1
    key = ((img_idx * 4 + lvl) * maxty + ty) * maxtx + tx
    return key, ty, tx


def _res_kernel(rank_ref, trow_ref, tcol_ref, ptile_ref, nt_ref, gcls_ref,
                geom_ref, f0, f1, f2, f3, out_ref, tile, sems, *,
                output_size, sampling_ratio, n_groups, c, highest, tile_w,
                col_stride, row_pieces, col_pieces):
    i = pl.program_id(0)
    o = output_size
    refs = (f0, f1, f2, f3)

    def start(rk):
        """Start the DMA of the tile at (clipped) local rank rk into buffer
        rk % 2.  Ranks past the last tile re-fetch the last tile (harmless:
        its buffer is never read; the final wait below retires it).  The
        per-rank tile source is ONE packed int32 (col0 | row0/8 | lvl |
        img — packed inline in the trace-time prep below, search "packed
        tile table"; the bit layout here must mirror that site): gathers on
        this TPU are element-throughput-bound, so the host prep
        builds/gathers one table instead of four."""
        rr = jnp.minimum(rk, nt_ref[0] - 1)
        slot = jax.lax.rem(rk, 2)
        p = ptile_ref[rr]
        img = p >> 20
        row0 = pl.multiple_of(((p >> 9) & 511) * 8, 8)
        col0 = pl.multiple_of((p & 511) * c, 128)
        lv = (p >> 18) & 3
        for lvv, f in enumerate(refs):
            @pl.when(lv == lvv)
            def _(f=f):
                pltpu.make_async_copy(
                    f.at[img, pl.ds(row0, TILE_H), pl.ds(col0, tile_w * c)],
                    tile.at[slot], sems.at[slot],
                ).start()

    def wait(rk):
        slot = jax.lax.rem(rk, 2)
        pltpu.make_async_copy(
            f0.at[0, pl.ds(0, TILE_H), pl.ds(0, tile_w * c)],
            tile.at[slot], sems.at[slot],
        ).wait()

    def pool(k, ru=WIN_H, cu=PATCH_W):
        """Pool roi k of this group from the resident tile.

        ``ru``/``cu`` (static) gate the matmul shapes to the roi's footprint
        piece: wy columns ≥ dy+nrows and wx columns ≥ ncols are EXACTLY zero
        (the production kernel's tail-DMA invariant, pallas_roi_align.py
        gate_matmul), so pooling from the first ru rows / cu cols of the
        window is bit-identical while the MXU shapes shrink to the piece.
        The per-group piece (max over the MINI rois, prep-computed) keeps
        the branch count per GROUP, not per roi — the r2 bisection showed
        per-roi pl.when machinery costs +0.17 µs/roi even predicated off.

        Measured (dev chip, serving mix, 2026-08-19): COLUMN gating pays —
        it shrinks matmul-1's N (= cu·C lanes, the MXU-time dim), matmul-2's
        K, the wx build and the tmp reshape: 1.385 → 1.070 µs/roi at 5 col
        pieces.  ROW gating does NOT (1.418): K = ru ≤ 48 is sub-MXU-tile,
        so shrinking it buys nothing and pays the branch, hence the
        single-piece row default.  A 3×3 row×col product grid measured
        4.71 µs/roi — per-group branch bodies are cheap only while the body
        count stays small.  PERF.md "Round-3" has the full table.
        """
        j = i * MINI + k
        slot = jax.lax.rem(rank_ref[j], 2)
        row = pl.multiple_of(trow_ref[j], 8)
        col = pl.multiple_of(tcol_ref[j] * c, 128)
        seg = tile[slot, pl.ds(row, ru), pl.ds(col, cu * c)]
        # pool-folded interp matrices in slice-local coords (prep shifted the
        # row geometry by the ≤7-row alignment residual)
        wy = _interp_matrix(geom_ref[k, 0], geom_ref[k, 2], geom_ref[k, 4],
                            geom_ref[k, 5], o, sampling_ratio, ru,
                            clamp_last=geom_ref[k, 8])
        wx = _interp_matrix(geom_ref[k, 1], geom_ref[k, 3], geom_ref[k, 6],
                            geom_ref[k, 7], o, sampling_ratio, cu,
                            clamp_last=geom_ref[k, 9])
        dn = (((1,), (0,)), ((), ()))
        if highest:
            tmp = jax.lax.dot_general(
                wy, seg.reshape(ru, cu * c), dimension_numbers=dn,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        else:
            tmp = jax.lax.dot_general(
                wy.astype(jnp.bfloat16), seg.reshape(ru, cu * c),
                dimension_numbers=dn, preferred_element_type=jnp.float32,
            )
        tmp = tmp.reshape(o, cu, c)
        pooled = jax.lax.dot_general(
            wx, tmp, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST if highest else None,
        )
        out_ref[k] = jnp.swapaxes(pooled, 0, 1).astype(out_ref.dtype)

    # The 8 per-roi tile-switch pl.when blocks cost +0.17 us/roi even
    # predicated OFF (PERF.md r2 bisection) while switches actually fire in
    # only ~1 group in 10 at serving tile occupancy.  Duplicate the pooling
    # body into a FAST path (zero per-roi branches) and a SLOW path (the
    # interleaved wait/start machinery), gated by ONE per-group check —
    # rank is non-decreasing along the sorted roi stream, so a change
    # across [last of previous group, last of this group] detects every
    # switch that could fire inside this group.
    jlast = i * MINI + MINI - 1
    jprev = jnp.maximum(i * MINI - 1, 0)
    any_sw = jnp.logical_or(i == 0, rank_ref[jlast] != rank_ref[jprev])

    @pl.when(any_sw)
    def _():
        @pl.when(i == 0)
        def _():
            r0 = rank_ref[0]
            start(r0)
            wait(r0)
            start(r0 + 1)
        for k in range(MINI):
            j = i * MINI + k
            if k == 0:
                @pl.when(i > 0)
                def _(j=j):
                    rj = rank_ref[j]

                    @pl.when(rj != rank_ref[j - 1])
                    def _():
                        wait(rj)
                        start(rj + 1)
            else:
                rj = rank_ref[j]

                @pl.when(rj != rank_ref[j - 1])
                def _(rj=rj):
                    wait(rj)
                    start(rj + 1)
            pool(k)

    @pl.when(jnp.logical_not(any_sw))
    def _():
        if len(row_pieces) == 1 and len(col_pieces) == 1:
            for k in range(MINI):
                pool(k)
        else:
            # one branch per (row, col) piece combo — per GROUP, selected by
            # the prep-computed group-max class (sorted-by-class within each
            # tile run, so groups are piece-uniform where the stream allows)
            g = gcls_ref[i]
            for ri, ru in enumerate(row_pieces):
                for ci, cu in enumerate(col_pieces):
                    @pl.when(g == ri * len(col_pieces) + ci)
                    def _(ru=ru, cu=cu):
                        for k in range(MINI):
                            pool(k, ru, cu)

    @pl.when(i == n_groups - 1)
    def _():
        # retire the one dangling lookahead DMA (started at the last tile
        # switch; its buffer is never read)
        wait(rank_ref[(n_groups - 1) * MINI + MINI - 1] + 1)


def _piece_class(nre, nce, row_pieces, col_pieces):
    """Piece-class index of each roi: smallest (row, col) piece pair covering
    its effective window footprint.  Plain vector math (no gathers)."""
    zero = jnp.zeros(nre.shape, jnp.int32)
    ri = sum((nre > p).astype(jnp.int32) for p in row_pieces[:-1]) + zero
    ci = sum((nce > p).astype(jnp.int32) for p in col_pieces[:-1]) + zero
    return ri, ci


def _ncols(fgeom, output_size):
    """Max window col the sample grid can touch (+2 covers floor+1 / ceil) —
    the x-axis mirror of ``_prep_scalars``' nrows bound; wx columns at or
    past this index are exactly zero."""
    return jnp.clip(
        jnp.ceil(fgeom[:, 1] + output_size * fgeom[:, 3]).astype(jnp.int32)
        + 2, 1, PATCH_W)


@functools.partial(
    jax.jit,
    static_argnames=("output_size", "sampling_ratio", "interpret", "roi_chunk",
                     "out_dtype", "row_pieces", "col_pieces"),
)
def pallas_roi_align_resident(
    features: Sequence[jnp.ndarray],
    rois: jnp.ndarray,
    output_size: int,
    sampling_ratio: int = 2,
    spatial_scales: Tuple[float, ...] = (0.25, 0.125, 0.0625, 0.03125),
    interpret: bool | str = "auto",
    roi_chunk: int = 2048,
    out_dtype=jnp.float32,
    row_pieces: Tuple[int, ...] = (WIN_H,),
    col_pieces: Tuple[int, ...] = (16, 24, 32, 40, PATCH_W),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Tile-resident multi-level RoIAlign over a flat, tile-sorted roi order.

    features: per level [B, H_l, W_l, C]; rois [B, R, 4] in image coords.
    Returns ``(pooled, order)`` with pooled [B·R, out, out, C] in TILE-SORTED
    order and ``order`` int32 [B·R] the sort permutation: ``pooled[s]`` is
    the output for original roi ``order[s]`` (flat index ``img·R + r``).
    Restore original order with ``out.at[order].set(pooled)`` — or, cheaper,
    run per-roi heads on ``pooled`` and unpermute their small outputs.

    f32 features pool with Precision.HIGHEST (exact); bf16 features round
    the weight/patch operands at the MXU like the production kernel plus one
    extra bf16 rounding of the row-pooled intermediate (|err| ≤ 2⁻⁸ rel —
    the serving profile is approximate by contract, tested ≤2e-2 abs on
    O(1) features).  VMEM: two resident tiles sized by ``tile_geometry``
    (bf16 [72, 120·C]; f32 [72, 96·C] @ 48-col stride, narrowing to
    [72, 80·C] @ 32 for output sizes > 7 whose 4× larger out block would
    blow the 16 MB scoped limit; compiled-TPU-tested at C=256 for both
    f32 shapes in test_tpu_compiled).
    """
    if interpret == "auto":
        interpret = jax.default_backend() != "tpu"
    assert row_pieces[-1] == WIN_H and col_pieces[-1] == PATCH_W, (
        "piece lists must end at the full window (WIN_H / PATCH_W)")
    assert (list(row_pieces) == sorted(row_pieces)
            and list(col_pieces) == sorted(col_pieces))
    ncls = len(row_pieces) * len(col_pieces)
    b, r = rois.shape[:2]
    c = features[0].shape[-1]
    cpad = max(0, -c % 128)
    c128 = c + cpad
    level_shapes = tuple((f.shape[1], f.shape[2]) for f in features)
    nlv = len(level_shapes)
    assert nlv == 4, "resident kernel is specialized to the 4-level FPN"

    # 4-byte dtypes use narrower tiles (two resident buffers + the out
    # block must fit the 16 MB scoped-VMEM limit at C=256; see
    # tile_geometry for the measured budgets).
    itemsize = jnp.dtype(features[0].dtype).itemsize
    wide = itemsize <= 2
    tile_w, col_stride = tile_geometry(itemsize, output_size)

    # Pyramid layout per level — ZERO-COPY where the raw array already
    # supports in-bounds tile DMA, padded otherwise.
    #
    # The interp weights at any cell outside [0, dim-1] are EXACTLY zero
    # (``_interp_matrix``: in_range gating + border clamping to
    # min(hi_bound-1, clamp_last)), so padding never supplies VALUES — it
    # only made every tile slice of the fixed stride grid in-bounds.  A
    # level whose raw array satisfies the DMA constraints directly
    # (row starts /8 ⇒ h ≡ 0 mod 8 and h ≥ TILE_H; w ≥ tile_w; lane offsets
    # /128 ⇒ c ≡ 0 mod 128) skips the pad: tile starts CLAMP into bounds
    # (r0 = min(ty·32, h-72), c0 = clip(tx·cs-1, 0, w-tile_w)) and the
    # per-roi window origin + geometry shift absorb the clamp (see the
    # unified A_y/A_x math below).  At serving geometry P2 alone is ~75% of
    # the old pad's ~1 GB/batch of HBM copy traffic.
    #
    # Padded levels keep the old layout: 1 leading cell (the torchvision -1
    # border sample position) + exactly enough trailing rows/cols that the
    # last stride-grid tile stays in bounds.
    padded, off = [], []
    for f, (h, w) in zip(features, level_shapes):
        if cpad == 0 and h % 8 == 0 and h >= TILE_H and w >= tile_w:
            padded.append(f)
            off.append(0)
        else:
            padded.append(jnp.pad(f, (
                (0, 0),
                (1, (h // ROW_STRIDE) * ROW_STRIDE + TILE_H - (h + 1)),
                (1, (w // col_stride) * col_stride + tile_w - (w + 1)),
                (0, cpad))))
            off.append(1)
    f2d = [p.reshape(b, p.shape[1], p.shape[2] * c128) for p in padded]
    # per-level array extents + lead offset, indexed by roi level below
    off_t = jnp.asarray(off, jnp.int32)
    harr_t = jnp.asarray([p.shape[1] for p in padded], jnp.int32)
    warr_t = jnp.asarray([p.shape[2] for p in padded], jnp.int32)

    def _window_origins(lvl, y0i, x0p):
        """Unified window/tile origins in ARRAY-frame coordinates.

        ``y0i``/``x0p`` are _prep_scalars' padded-frame starts (array index
        of absolute cell a is a + off).  Returns (ay, ax, dyi, dxi): the
        8-aligned window row origin, the col origin, and the int geometry
        shifts — fgeom's patch-local coordinates (origin at absolute y0/x0)
        move to window-local by adding dyi/dxi.  For padded levels every
        clamp below is a proven no-op and dyi/dxi reduce to the old
        (y0i - floor8(y0i), 0); for zero-copy levels the clamps keep the
        window in [0, dim) while the shifted geometry keeps the sample
        cells (all within [0, dim-1] by the zero-weight invariant) inside
        the 48-cell window — coverage holds because floor8(y0i) ≥ y0i-7 ⇒
        window end ≥ first cell + 40, and a clamped origin ends exactly at
        the array's last row/col."""
        offv = off_t[lvl]
        ha, wa = harr_t[lvl], warr_t[lvl]
        ay = jnp.minimum((y0i // 8) * 8, ha - WIN_H)
        ax = jnp.minimum(x0p, wa - PATCH_W)
        dyi = y0i - (1 - offv) - ay
        dxi = x0p - (1 - offv) - ax
        return ay, ax, dyi, dxi

    n = b * r
    flat_rois = rois.reshape(n, 4)
    img_idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), r)
    # Light pre-sort pass: only the tile KEY is needed before the sort.
    # Everything per-roi is recomputed from the SORTED rois afterwards —
    # gathers on this TPU are element-throughput-bound (measured ~4 ms /
    # 44k rois for the previous 7-gather pipeline, tools/exp_sort_pack.py),
    # so the only gather kept is the [n, 4] roi rows themselves.
    lvl, y0i, x0p, nrows_pre, fg_pre = _prep_scalars(
        flat_rois, level_shapes, spatial_scales, output_size
    )
    key, _ty, _tx = tile_sort_keys(lvl, y0i, x0p, img_idx, level_shapes[0],
                                   wide=wide, col_stride=col_stride)
    # Secondary sort by footprint piece class WITHIN each tile run, so the
    # kernel's MINI groups are piece-uniform where the stream allows — the
    # per-group matmul gate then runs most groups at their true piece.
    # Class order inside a tile is irrelevant to correctness (the gate uses
    # the group MAX class), so overflow fallbacks may drop it freely.
    if ncls > 1:
        # effective WINDOW-frame footprint: the geometry shift dyi/dxi moves
        # the cells, so the piece bound must include it (clip ≥1 keeps the
        # dxi = -1 lead-shift conservative-exact)
        _ay, _ax, dyi_p, dxi_p = _window_origins(lvl, y0i, x0p)
        ri_p, ci_p = _piece_class(
            jnp.clip(dyi_p + nrows_pre, 1, WIN_H),
            jnp.clip(dxi_p + _ncols(fg_pre, output_size), 1, PATCH_W),
            row_pieces, col_pieces)
        cls_pre = ri_p * len(col_pieces) + ci_p
    else:
        cls_pre = jnp.zeros_like(key)
    # order + sorted keys in ONE single-array sort pass when (key, class,
    # index) packs into int32; key < b·4·maxty·maxtx by construction.  Ties
    # break by index == stable argsort.
    idx_bits = max(1, (n - 1).bit_length())
    maxty = level_shapes[0][0] // ROW_STRIDE + 1
    maxtx = level_shapes[0][1] // col_stride + 1
    max_packed = ((b * 4 * maxty * maxtx * ncls - 1) << idx_bits) | (n - 1)
    if max_packed < 2**31:
        key2 = key * ncls + cls_pre
        srt = jnp.sort((key2 << idx_bits) | jnp.arange(n, dtype=jnp.int32))
        order = (srt & ((1 << idx_bits) - 1)).astype(jnp.int32)
        key_s = ((srt >> idx_bits) // ncls).astype(jnp.int32)
    elif (b * 4 * maxty * maxtx * ncls) < 2**31:
        key2 = key * ncls + cls_pre
        order = jnp.argsort(key2, stable=True).astype(jnp.int32)
        key_s = key2[order] // ncls
    else:
        # class bits don't fit: sort by tile key alone (groups may mix
        # classes — the group-max gate stays correct, just less selective)
        order = jnp.argsort(key, stable=True).astype(jnp.int32)
        key_s = key[order]

    rois_s = flat_rois[order]
    img_s = order // r                      # flat index = img·r + roi
    lvl_s, y0i_s, x0p_s, nrows_s, fgeom = _prep_scalars(
        rois_s, level_shapes, spatial_scales, output_size
    )
    nce_s = _ncols(fgeom, output_size)
    # Window origin per roi (array frame, row 8-aligned) + geometry shift.
    # The row window is 8 rows wider than the production patch (WIN_H=48 vs
    # PATCH=40) purely to absorb the alignment/lead shift — out-of-contract
    # footprints must still CLAMP at patch row PATCH-1 / col PATCH_W-1
    # exactly like the production kernel (so footprint_clamp_mask /
    # apply_exact_fixup transfer unchanged); the per-roi dynamic clamp
    # bounds (dy + PATCH - 1, dx + PATCH_W - 1) ride in geometry columns
    # 8/9 and feed _interp_matrix's clamp_last.
    ay_s, ax_s, dyi_s, dxi_s = _window_origins(lvl_s, y0i_s, x0p_s)
    dy = dyi_s.astype(jnp.float32)
    dx = dxi_s.astype(jnp.float32)
    fgeom = fgeom.at[:, 0].add(dy)
    fgeom = fgeom.at[:, 4].add(dy)
    fgeom = fgeom.at[:, 5].add(dy)
    fgeom = fgeom.at[:, 1].add(dx)
    fgeom = fgeom.at[:, 6].add(dx)
    fgeom = fgeom.at[:, 7].add(dx)
    geom_s = jnp.concatenate(
        [fgeom, (dy + (PATCH - 1.0))[:, None],
         (dx + (PATCH_W - 1.0))[:, None],
         jnp.zeros((fgeom.shape[0], 6), jnp.float32)], axis=1)

    _key2, ty_s, tx_s = tile_sort_keys(lvl_s, y0i_s, x0p_s, img_s,
                                       level_shapes[0], wide=wide,
                                       col_stride=col_stride)
    # tile origins (array frame): clamped into bounds; the clamps are
    # no-ops on padded levels (pad construction guarantees room) and keep
    # zero-copy levels' DMA in [0, dim).  Same-key rois share (r0, c0) —
    # both are functions of (lvl, ty, tx) — so the per-rank scatter below
    # stays single-valued.
    offv_s = off_t[lvl_s]
    r0_s = jnp.minimum(ty_s * ROW_STRIDE, harr_t[lvl_s] - TILE_H)
    c0_s = jnp.clip(tx_s * col_stride - (1 - offv_s), 0,
                    warr_t[lvl_s] - tile_w)
    trow = ay_s - r0_s                  # ∈ [0, 24], /8
    tcol = ax_s - c0_s                  # ∈ [0, tile_w - PATCH_W]
    # ONE packed per-rank tile-source table (img | lvl | row0/8 | col0) —
    # unpacked by the kernel's start().  The bit budget (9+9+2, img gets
    # the remaining 11) is checked loudly: a bare assert would vanish under
    # `python -O`, turning an overflow into silent DMA-source corruption
    # (ADVICE r2).
    max_r08 = max((p.shape[1] - TILE_H) // 8 for p in padded)
    max_c0 = max(p.shape[2] - tile_w for p in padded)
    if not (max_r08 < 512 and max_c0 < 512 and b < 2 ** 11):
        raise ValueError(
            f"packed tile table overflow: level-0 shape {level_shapes[0]} "
            f"(max row0/8 {max_r08} >= 512 or max col0 {max_c0} >= 512) or "
            f"batch {b} >= 2048 — this geometry exceeds the resident "
            "kernel's int32 tile encoding; use roi_align_backend='pallas' "
            "(patch-DMA) or 'xla' for it")
    ptile = (((((img_s << 2) | lvl_s) << 9) | (r0_s // 8)) << 9) | c0_s

    chg = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), key_s[1:] != key_s[:-1]])
    rank = jnp.cumsum(chg.astype(jnp.int32)) - 1   # dense 0-based tile rank
    n_tiles = rank[-1] + 1
    # per-rank tile source (duplicate scatters write equal values)
    ptile_rk = jnp.zeros((n,), jnp.int32).at[rank].set(ptile)

    # per-roi piece class on the SORTED stream (recomputed, not gathered);
    # WINDOW-frame extents include the geometry shift
    ri_s, ci_s = _piece_class(jnp.clip(dyi_s + nrows_s, 1, WIN_H),
                              jnp.clip(dxi_s + nce_s, 1, PATCH_W),
                              row_pieces, col_pieces)

    pad = (-n) % roi_chunk
    if pad:
        edge = lambda a: jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1),
                                 mode="edge")
        rank, trow, tcol, geom_s, ri_s, ci_s = map(
            edge, (rank, trow, tcol, geom_s, ri_s, ci_s))
    npad = n + pad
    nc = npad // roi_chunk
    # group-max piece class: every roi in a MINI group pools at (ru, cu) ≥
    # its own piece — larger-than-needed pieces only add exact-zero terms
    gcls = (ri_s.reshape(-1, MINI).max(1) * len(col_pieces)
            + ci_s.reshape(-1, MINI).max(1)).astype(jnp.int32)

    # chunk-local ranks + per-chunk rank→tile-coord tables
    rank_c = rank.reshape(nc, roi_chunk)
    base = rank_c[:, 0]
    rank_local = rank_c - base[:, None]
    ridx = jnp.clip(base[:, None] + jnp.arange(roi_chunk)[None], 0,
                    n_tiles - 1)
    ptile_c = ptile_rk[ridx]
    ntl = (rank_c[:, -1] - base + 1).reshape(nc, 1)

    n_groups = roi_chunk // MINI
    geom_c = geom_s.reshape(nc, n_groups * MINI, 16)

    dtype = padded[0].dtype
    highest = jnp.dtype(dtype) == jnp.float32
    kernel = functools.partial(
        _res_kernel, output_size=output_size, sampling_ratio=sampling_ratio,
        n_groups=n_groups, c=c128, highest=highest, tile_w=tile_w,
        col_stride=col_stride, row_pieces=row_pieces, col_pieces=col_pieces,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(n_groups,),
        in_specs=[
            pl.BlockSpec((8, 16), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=pl.BlockSpec(
            (MINI, output_size, output_size, c128), lambda i, *_: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, TILE_H, tile_w * c128), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (roi_chunk, output_size, output_size, c128), out_dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )

    chunk = lambda a: a.reshape((nc, roi_chunk) + a.shape[1:])

    def body(args):
        rk, tr, tc, pt, nt, gc, geom = args
        return call(rk, tr, tc, pt, nt, gc, geom, *f2d)

    outs = jax.lax.map(
        body,
        (rank_local, chunk(trow), chunk(tcol), ptile_c, ntl,
         gcls.reshape(nc, n_groups), geom_c),
    )
    out = outs.reshape(npad, output_size, output_size, c128)[:n]
    if cpad:
        out = out[..., :c]
    return out, order


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def pallas_roi_align_resident_trainable(
    features, rois, output_size, sampling_ratio=2, roi_chunk=2048,
    out_dtype=jnp.float32, adjoint="xla",
):
    """Differentiable tile-resident RoIAlign (VERDICT r2 #7): the resident
    kernel forward + an EXACT adjoint as backward, mirroring
    ``pallas_roi_align.pallas_roi_align_trainable``.  RoIAlign is linear
    in ``features`` for fixed rois, so the vjp is a fixed transpose
    independent of the forward's values; gradients match the exact kernel
    everywhere the two forwards agree.  No grad w.r.t. rois (the
    reference detaches proposals).

    ``adjoint``: "xla" (scatter-add, ops/roi_align) or "pallas" (the
    tile-resident adjoint kernel, ops/pallas_roi_adjoint — same bilinear
    summands accumulated in VMEM tiles instead of HBM scatters; see
    PERF.md round 5 for the on-chip A/B and
    RoIHeadsConfig.roi_adjoint_backend for the config knob).

    features: TUPLE of per-level [B, H, W, C]; rois [B, R, 4].
    Returns (pooled, order) exactly like ``pallas_roi_align_resident`` —
    ``order`` is an int permutation (zero cotangent).
    """
    return pallas_roi_align_resident(
        features, rois, output_size, sampling_ratio,
        roi_chunk=roi_chunk, out_dtype=out_dtype,
    )


def _res_trainable_fwd(features, rois, output_size, sampling_ratio,
                       roi_chunk, out_dtype, adjoint):
    out = pallas_roi_align_resident_trainable(
        features, rois, output_size, sampling_ratio, roi_chunk, out_dtype,
        adjoint)
    return out, (features, rois, out[1])


def _res_trainable_bwd(output_size, sampling_ratio, roi_chunk, out_dtype,
                       adjoint, res, g):
    features, rois, order = res
    g_pooled = g[0]  # cotangent for `order` is zero (int output)
    b, r = rois.shape[:2]
    # pooled[s] belongs to original flat roi order[s]: route each sorted
    # cotangent row back to its original slot, then run the exact adjoint
    # in original roi order.
    g_orig = jnp.zeros_like(g_pooled).at[order].set(g_pooled)
    g_orig = g_orig.reshape((b, r) + g_pooled.shape[1:]).astype(jnp.float32)
    level_shapes = tuple((f.shape[1], f.shape[2]) for f in features)
    if adjoint == "pallas":
        from .pallas_roi_adjoint import multilevel_roi_align_adjoint_pallas

        # precision follows the forward's own rule: full (bit-matching
        # summands) for f32 features, single bf16 MXU passes for bf16
        adj = multilevel_roi_align_adjoint_pallas(
            g_orig, rois, level_shapes, output_size, sampling_ratio,
            highest=jnp.dtype(features[0].dtype) == jnp.float32)
    else:
        from .roi_align import multilevel_roi_align_adjoint

        adj = jax.vmap(
            lambda gi, ri: multilevel_roi_align_adjoint(
                gi, level_shapes, ri, output_size, sampling_ratio
            )
        )(g_orig, rois)
    gfeats = tuple(a.astype(f.dtype) for a, f in zip(adj, features))
    return gfeats, jnp.zeros_like(rois)


pallas_roi_align_resident_trainable.defvjp(_res_trainable_fwd,
                                           _res_trainable_bwd)
