"""Experiment: can a shared-residency RoIAlign beat the per-roi DMA floor?

The production kernel (ops/pallas_roi_align.py) DMAs ~1 MB of HBM per roi
(40x48x256 bf16 window) while the UNIQUE pyramid bytes are ~80x smaller —
rois overlap heavily.  A level-resident design would stream each FPN level
into VMEM once (strips) and have every roi gather its window from VMEM.
Whether that wins hinges on the numbers this probe measures: the per-roi
cost of a dynamic VMEM slice + pooling matmul when NO per-roi HBM DMA
happens at all (the resident design's lower bound), with and without the
production footprint gating (nrows drawn from the serving roi mix).

All timing runs INSIDE one jit via lax.scan over distinct inputs (device
dispatch is async through the tunnel; per-call timing overstates by ~2x —
the first version of this probe did exactly that).

Variants (timing only — geometry is faked so every roi reads one resident
strip; correctness is NOT evaluated):
  combined       per-roi HBM patch DMA (ungated) + Kronecker matmul
  dma_floor      per-roi patch DMA + trivial store (DMA/issue floor)
  compute0       no DMA, full-K matmul + wc expansion (pure compute)
  compute_gated  no DMA, production pool_rows branches on realistic nrows
  res_slice      no per-roi DMA: dynamic VMEM slice of a resident strip
                 + full-K matmul
  res_gated      resident slice + nrows-gated matmul — the actual floor of
                 a shared-residency production kernel
  res_mm         resident, separable two-matmul form straight off a 2D ref
                 (no wc expansion, no pre-slice reshape)

Production reference same-session: run tools' production timer (see
PERF.md round-2 session notes) — pallas_roi_align_batched gate_matmul=True.

Usage: python tools/exp_roi_resident.py [--rois 16384] [--width 168]
"""

import argparse
import functools
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rois", type=int, default=16384)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--channels", type=int, default=256)
    ap.add_argument("--width", type=int, default=168,
                    help="resident strip width (P2 full width = 336)")
    ap.add_argument(
        "--variants",
        default="combined,dma_floor,compute0,compute_gated,res_slice,"
                "res_gated,res_mm")
    args = ap.parse_args()

    import os

    import jax
    if os.environ.get("SEAM_EXP_CPU"):
        # sitecustomize clobbers JAX_PLATFORMS; switch in-process (CLAUDE.md)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from seam_match_rcnn_tpu.ops import pallas_roi_align as pra

    PATCH, PATCH_W = pra.PATCH, pra.PATCH_W  # 40, 48
    STRIP_ROWS = 48
    TALL_ROWS = 72
    C = args.channels
    W = args.width
    MINI = 8
    o, ratio = 7, 2
    BOUNDS = (16, 24, 32, PATCH)  # production splits + full

    def _wy_wx(geom_ref, k, rows):
        wy = pra._interp_matrix(geom_ref[k, 0], geom_ref[k, 2],
                                geom_ref[k, 4], geom_ref[k, 5],
                                o, ratio, rows)
        wx = pra._interp_matrix(geom_ref[k, 1], geom_ref[k, 3],
                                geom_ref[k, 6], geom_ref[k, 7],
                                o, ratio, PATCH_W)
        return wy.astype(jnp.bfloat16), wx.astype(jnp.bfloat16)

    def _wc(geom_ref, k, rows):
        wy, wx = _wy_wx(geom_ref, k, rows)
        wyR = jnp.concatenate(
            [jnp.broadcast_to(wy[t:t + 1], (o, rows)) for t in range(o)], 0)
        wxR = jnp.concatenate([wx] * o, axis=0)
        return jnp.concatenate(
            [wyR[:, py:py + 1] * wxR for py in range(rows)], axis=1)

    dn = (((1,), (0,)), ((), ()))

    def _mm(wc, pm):
        return jax.lax.dot_general(
            wc, pm, dimension_numbers=dn,
            preferred_element_type=jnp.float32)

    def _gated(nr, body):
        for bi, ru in enumerate(BOUNDS):
            if bi == 0:
                cond = nr <= ru
            elif bi == len(BOUNDS) - 1:
                cond = nr > BOUNDS[bi - 1]
            else:
                cond = (nr > BOUNDS[bi - 1]) & (nr <= ru)
            pl.when(cond)(functools.partial(body, ru))

    def make_kernel(variant):
        def kern(y_ref, x_ref, nr_ref, geom_ref, *rest):
            if variant in ("res_slice", "res_gated"):
                strip_ref, f0, out_ref, patch, sem = rest
            elif variant == "res_mm_pre":
                strip2d_ref, wmat_ref, f0, out_ref, patch, sem = rest
            elif variant in ("res_mm", "res_mm_dynrow", "res_mm_slot",
                             "res_mm_full", "res_mm_sw", "res_mm_sw1",
                             "res_mm_clamp", "res_mm_fastslow",
                             "res_mm_rowgate", "res_mm_colgate"):
                strip2d_ref, f0, out_ref, patch, sem = rest
            else:
                f0, out_ref, patch, sem = rest
            i = pl.program_id(0)
            if variant in ("combined", "dma_floor"):
                for k in range(MINI):
                    j = i * MINI + k
                    y0 = pl.multiple_of(y_ref[j], 8)
                    x0 = pl.multiple_of(x_ref[j], 8)
                    pltpu.make_async_copy(
                        f0.at[0, pl.ds(y0, PATCH), pl.ds(x0, PATCH_W), :],
                        patch.at[k], sem.at[k],
                    ).start()
            for k in range(MINI):
                j = i * MINI + k
                if variant in ("combined", "dma_floor"):
                    pltpu.make_async_copy(
                        f0.at[0, pl.ds(0, PATCH), pl.ds(0, PATCH_W), :],
                        patch.at[k], sem.at[k],
                    ).wait()
                if variant == "dma_floor":
                    out_ref[k] = patch[k][:o, :o, :].astype(out_ref.dtype)
                elif variant == "combined":
                    wc = _wc(geom_ref, k, PATCH)
                    out_ref[k] = _mm(
                        wc, patch[k][:].reshape(PATCH * PATCH_W, C)
                    ).reshape(o, o, C).astype(out_ref.dtype)
                elif variant == "compute0":
                    wc = _wc(geom_ref, k, PATCH)
                    out_ref[k] = _mm(
                        wc, patch[k][:].reshape(PATCH * PATCH_W, C)
                    ).reshape(o, o, C).astype(out_ref.dtype)
                elif variant == "compute_gated":
                    def body(ru, k=k):
                        wc = _wc(geom_ref, k, ru)
                        out_ref[k] = _mm(
                            wc, patch[k][:ru].reshape(ru * PATCH_W, C)
                        ).reshape(o, o, C).astype(out_ref.dtype)
                    _gated(nr_ref[j], body)
                elif variant == "res_slice":
                    y0 = pl.multiple_of(y_ref[j], 8)
                    x0 = pl.multiple_of(x_ref[j], 8)
                    wc = _wc(geom_ref, k, PATCH)
                    pm = strip_ref[pl.ds(y0, PATCH), pl.ds(x0, PATCH_W), :]
                    out_ref[k] = _mm(
                        wc, pm.reshape(PATCH * PATCH_W, C)).reshape(o, o, C).astype(out_ref.dtype)
                elif variant == "res_gated":
                    y0 = pl.multiple_of(y_ref[j], 8)
                    x0 = pl.multiple_of(x_ref[j], 8)

                    def body(ru, k=k, y0=y0, x0=x0):
                        wc = _wc(geom_ref, k, ru)
                        pm = strip_ref[pl.ds(y0, ru), pl.ds(x0, PATCH_W), :]
                        out_ref[k] = _mm(
                            wc, pm.reshape(ru * PATCH_W, C)).reshape(o, o, C).astype(out_ref.dtype)
                    _gated(nr_ref[j], body)
                elif variant == "res_mm":
                    x0 = pl.multiple_of(x_ref[j], 8)
                    wy, wx = _wy_wx(geom_ref, k, PATCH)
                    wy48 = jnp.concatenate(
                        [wy, jnp.zeros((o, STRIP_ROWS - PATCH),
                                       jnp.bfloat16)], axis=1)
                    seg = strip2d_ref[:, pl.ds(x0 * C, PATCH_W * C)]
                    tmp = jax.lax.dot_general(
                        wy48, seg, dimension_numbers=dn,
                        preferred_element_type=jnp.float32,
                    ).reshape(o, PATCH_W, C)
                    pooled = jax.lax.dot_general(
                        wx.astype(jnp.float32), tmp,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    out_ref[k] = jnp.swapaxes(pooled, 0, 1).astype(out_ref.dtype)
                elif variant in ("res_mm_full", "res_mm_sw", "res_mm_sw1"):
                    # res_mm_slot + everything else the production resident
                    # kernel does per roi: the tile-switch wait/start pl.when
                    # machinery (predicated OFF at runtime — nr_ref plays the
                    # rank array and is constant) with the 4-way level
                    # dispatch inside start(); _full additionally uses the
                    # 48-row interp matrix with a dynamic clamp_last (_sw
                    # keeps the static 40-row + zero-pad build).  Isolates
                    # the branch-structure cost from the interp cost.
                    def _start(rk):
                        rr = jnp.minimum(rk, 0)
                        sl = jax.lax.rem(rk, 2)
                        row0 = pl.multiple_of(y_ref[rr], 8)
                        col0 = pl.multiple_of(x_ref[rr] * C, 128)
                        if variant == "res_mm_sw1":
                            # flat-pyramid layout: single unconditional-
                            # target DMA, no per-level dispatch
                            pltpu.make_async_copy(
                                f0.at[0, pl.ds(row0, TALL_ROWS),
                                      pl.ds(col0, W * C)],
                                strip2d_ref.at[sl], sem.at[sl],
                            ).start()
                            return
                        lv = jax.lax.rem(x_ref[rr], 4)
                        for lvv in range(4):
                            @pl.when(lv == lvv)
                            def _():
                                pltpu.make_async_copy(
                                    f0.at[0, pl.ds(row0, TALL_ROWS),
                                          pl.ds(col0, W * C)],
                                    strip2d_ref.at[sl], sem.at[sl],
                                ).start()

                    def _wait(rk):
                        sl = jax.lax.rem(rk, 2)
                        pltpu.make_async_copy(
                            f0.at[0, pl.ds(0, TALL_ROWS), pl.ds(0, W * C)],
                            strip2d_ref.at[sl], sem.at[sl],
                        ).wait()

                    if k == 0:
                        @pl.when(i == 0)
                        def _():
                            r0 = nr_ref[0]
                            _start(r0)
                            _wait(r0)
                            _start(r0 + 1)

                        @pl.when(i > 0)
                        def _(j=j):
                            rj = nr_ref[j]

                            @pl.when(rj != nr_ref[j - 1])
                            def _():
                                _wait(rj)
                                _start(rj + 1)
                    else:
                        rj = nr_ref[j]

                        @pl.when(rj != nr_ref[j - 1])
                        def _(rj=rj):
                            _wait(rj)
                            _start(rj + 1)

                    x0 = pl.multiple_of(x_ref[j], 8)
                    y0 = pl.multiple_of(y_ref[j], 8)
                    if variant == "res_mm_full":
                        wy48 = pra._interp_matrix(
                            geom_ref[k, 0], geom_ref[k, 2], geom_ref[k, 4],
                            geom_ref[k, 5], o, ratio, STRIP_ROWS,
                            clamp_last=geom_ref[k, 5]).astype(jnp.bfloat16)
                    else:
                        wy, _ = _wy_wx(geom_ref, k, PATCH)
                        wy48 = jnp.concatenate(
                            [wy, jnp.zeros((o, STRIP_ROWS - PATCH),
                                           jnp.bfloat16)], axis=1)
                    wx = pra._interp_matrix(
                        geom_ref[k, 1], geom_ref[k, 3], geom_ref[k, 6],
                        geom_ref[k, 7], o, ratio, PATCH_W)
                    slot = jax.lax.rem(nr_ref[j], 2)
                    seg = strip2d_ref[slot, pl.ds(y0, STRIP_ROWS),
                                      pl.ds(x0 * C, PATCH_W * C)]
                    tmp = jax.lax.dot_general(
                        wy48, seg, dimension_numbers=dn,
                        preferred_element_type=jnp.float32,
                    ).reshape(o, PATCH_W, C)
                    pooled = jax.lax.dot_general(
                        wx, tmp,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    out_ref[k] = jnp.swapaxes(pooled, 0, 1).astype(out_ref.dtype)
                    if k == MINI - 1:
                        @pl.when(i == pl.num_programs(0) - 1)
                        def _(j=j):
                            # retire the dangling lookahead DMA (started at
                            # init; never waited since no switches fire)
                            _wait(nr_ref[j] + 1)
                elif variant == "res_mm_fastslow":
                    # The r2 bisection showed the 8 per-roi tile-switch
                    # pl.when blocks cost +0.17 us/roi even predicated OFF
                    # (res_mm_sw 1.475 vs res_mm_slot 1.303).  This variant
                    # duplicates the pooling body into a FAST path (zero
                    # per-roi branches) and a SLOW path (the interleaved
                    # switch machinery), gated by ONE per-group check:
                    # rank[last of group] != rank[last of prev group].
                    # Predicated OFF (rank constant) this measures the
                    # fast-path floor the production kernel could reach.
                    if k != 0:
                        continue  # whole group emitted at k == 0

                    def _start(rk):
                        rr = jnp.minimum(rk, 0)
                        sl = jax.lax.rem(rk, 2)
                        row0 = pl.multiple_of(y_ref[rr], 8)
                        col0 = pl.multiple_of(x_ref[rr] * C, 128)
                        lv = jax.lax.rem(x_ref[rr], 4)
                        for lvv in range(4):
                            @pl.when(lv == lvv)
                            def _():
                                pltpu.make_async_copy(
                                    f0.at[0, pl.ds(row0, TALL_ROWS),
                                          pl.ds(col0, W * C)],
                                    strip2d_ref.at[sl], sem.at[sl],
                                ).start()

                    def _wait(rk):
                        sl = jax.lax.rem(rk, 2)
                        pltpu.make_async_copy(
                            f0.at[0, pl.ds(0, TALL_ROWS), pl.ds(0, W * C)],
                            strip2d_ref.at[sl], sem.at[sl],
                        ).wait()

                    def pool(kk):
                        jj = i * MINI + kk
                        x0 = pl.multiple_of(x_ref[jj], 8)
                        y0 = pl.multiple_of(y_ref[jj], 8)
                        wy, wx = _wy_wx(geom_ref, kk, PATCH)
                        wy48 = jnp.concatenate(
                            [wy, jnp.zeros((o, STRIP_ROWS - PATCH),
                                           jnp.bfloat16)], axis=1)
                        slot = jax.lax.rem(nr_ref[jj], 2)
                        seg = strip2d_ref[slot, pl.ds(y0, STRIP_ROWS),
                                          pl.ds(x0 * C, PATCH_W * C)]
                        tmp = jax.lax.dot_general(
                            wy48, seg, dimension_numbers=dn,
                            preferred_element_type=jnp.float32,
                        ).reshape(o, PATCH_W, C)
                        pooled = jax.lax.dot_general(
                            wx.astype(jnp.float32), tmp,
                            dimension_numbers=(((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                        out_ref[kk] = jnp.swapaxes(pooled, 0, 1).astype(
                            out_ref.dtype)

                    jlast = i * MINI + MINI - 1
                    jprev = jnp.maximum(i * MINI - 1, 0)
                    any_sw = (i == 0) | (nr_ref[jlast] != nr_ref[jprev])

                    @pl.when(any_sw)
                    def _():
                        @pl.when(i == 0)
                        def _():
                            r0 = nr_ref[0]
                            _start(r0)
                            _wait(r0)
                            _start(r0 + 1)
                        for k2 in range(MINI):
                            j2 = i * MINI + k2
                            if k2 == 0:
                                @pl.when(i > 0)
                                def _(j2=j2):
                                    rj = nr_ref[j2]

                                    @pl.when(rj != nr_ref[j2 - 1])
                                    def _():
                                        _wait(rj)
                                        _start(rj + 1)
                            else:
                                rj = nr_ref[j2]

                                @pl.when(rj != nr_ref[j2 - 1])
                                def _(rj=rj):
                                    _wait(rj)
                                    _start(rj + 1)
                            pool(k2)

                    @pl.when(jnp.logical_not(any_sw))
                    def _():
                        for k2 in range(MINI):
                            pool(k2)

                    @pl.when(i == pl.num_programs(0) - 1)
                    def _():
                        _wait(nr_ref[jlast] + 1)
                elif variant == "res_mm_pre":
                    # res_mm_slot with PRECOMPUTED interp matrices streamed
                    # per group through a VMEM BlockSpec: zero in-kernel VPU
                    # construction — isolates the construction cost from the
                    # matmul floor.
                    x0 = pl.multiple_of(x_ref[j], 8)
                    y0 = pl.multiple_of(y_ref[j], 8)
                    wy48p = wmat_ref[k, 0]
                    wxp = wmat_ref[k, 1]
                    slot = jax.lax.rem(nr_ref[j], 2)
                    seg = strip2d_ref[slot, pl.ds(y0, STRIP_ROWS),
                                      pl.ds(x0 * C, PATCH_W * C)]
                    tmp = jax.lax.dot_general(
                        wy48p, seg, dimension_numbers=dn,
                        preferred_element_type=jnp.float32,
                    ).reshape(o, PATCH_W, C)
                    pooled = jax.lax.dot_general(
                        wxp.astype(jnp.float32), tmp,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    out_ref[k] = jnp.swapaxes(pooled, 0, 1).astype(out_ref.dtype)
                elif variant in ("res_mm_rowgate", "res_mm_colgate"):
                    # per-GROUP footprint gating (one branch pair per MINI
                    # group, class = group max of nrows): rowgate shrinks the
                    # first matmul's K (sub-128-lane — expected ~free on the
                    # MXU), colgate shrinks its N = cu*C lanes (the real
                    # MXU-time dim).  Measures gate win/cost vs res_mm_slot.
                    if k != 0:
                        continue
                    jbase = i * MINI
                    gmax = nr_ref[jbase]
                    for kk in range(1, MINI):
                        gmax = jnp.maximum(gmax, nr_ref[jbase + kk])

                    def pool_g(ru, cu):
                        for kk in range(MINI):
                            jj = jbase + kk
                            x0 = pl.multiple_of(x_ref[jj], 8)
                            y0 = pl.multiple_of(y_ref[jj], 8)
                            wy = pra._interp_matrix(
                                geom_ref[kk, 0], geom_ref[kk, 2],
                                geom_ref[kk, 4], geom_ref[kk, 5],
                                o, ratio, ru).astype(jnp.bfloat16)
                            wx = pra._interp_matrix(
                                geom_ref[kk, 1], geom_ref[kk, 3],
                                geom_ref[kk, 6], geom_ref[kk, 7],
                                o, ratio, cu)
                            slot = jax.lax.rem(nr_ref[jj], 2)
                            seg = strip2d_ref[slot, pl.ds(y0, ru),
                                              pl.ds(x0 * C, cu * C)]
                            tmp = jax.lax.dot_general(
                                wy, seg, dimension_numbers=dn,
                                preferred_element_type=jnp.float32,
                            ).reshape(o, cu, C)
                            pooled = jax.lax.dot_general(
                                wx.astype(jnp.float32), tmp,
                                dimension_numbers=(((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                            )
                            out_ref[kk] = jnp.swapaxes(pooled, 0, 1).astype(
                                out_ref.dtype)

                    if variant == "res_mm_rowgate":
                        pl.when(gmax <= 24)(
                            functools.partial(pool_g, 24, PATCH_W))
                        pl.when(gmax > 24)(
                            functools.partial(pool_g, STRIP_ROWS, PATCH_W))
                    else:
                        pl.when(gmax <= 24)(
                            functools.partial(pool_g, STRIP_ROWS, 24))
                        pl.when(gmax > 24)(
                            functools.partial(pool_g, STRIP_ROWS, PATCH_W))
                elif variant == "res_mm_clamp":
                    # res_mm_slot + the production resident kernel's interp
                    # matrices: 48-row wy with a DYNAMIC clamp_last bound and
                    # per-roi generation at full rows (no static 40-row build
                    # + zero-pad).  Isolates the interp-matrix cost.
                    x0 = pl.multiple_of(x_ref[j], 8)
                    y0 = pl.multiple_of(y_ref[j], 8)
                    wy48 = pra._interp_matrix(
                        geom_ref[k, 0], geom_ref[k, 2], geom_ref[k, 4],
                        geom_ref[k, 5], o, ratio, STRIP_ROWS,
                        clamp_last=geom_ref[k, 5]).astype(jnp.bfloat16)
                    wx = pra._interp_matrix(
                        geom_ref[k, 1], geom_ref[k, 3], geom_ref[k, 6],
                        geom_ref[k, 7], o, ratio, PATCH_W)
                    slot = jax.lax.rem(nr_ref[j], 2)
                    seg = strip2d_ref[slot, pl.ds(y0, STRIP_ROWS),
                                      pl.ds(x0 * C, PATCH_W * C)]
                    tmp = jax.lax.dot_general(
                        wy48, seg, dimension_numbers=dn,
                        preferred_element_type=jnp.float32,
                    ).reshape(o, PATCH_W, C)
                    pooled = jax.lax.dot_general(
                        wx.astype(jnp.float32), tmp,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    out_ref[k] = jnp.swapaxes(pooled, 0, 1).astype(out_ref.dtype)
                elif variant in ("res_mm_dynrow", "res_mm_slot"):
                    # the real resident kernel's addressing: dynamic sublane
                    # row offset (y in {0..24}), and for _slot additionally a
                    # dynamic leading buffer index into a [2, 72, W*C] ref
                    x0 = pl.multiple_of(x_ref[j], 8)
                    y0 = pl.multiple_of(y_ref[j], 8)
                    wy, wx = _wy_wx(geom_ref, k, PATCH)
                    wy48 = jnp.concatenate(
                        [wy, jnp.zeros((o, STRIP_ROWS - PATCH),
                                       jnp.bfloat16)], axis=1)
                    if variant == "res_mm_slot":
                        slot = jax.lax.rem(nr_ref[j], 2)
                        seg = strip2d_ref[slot, pl.ds(y0, STRIP_ROWS),
                                          pl.ds(x0 * C, PATCH_W * C)]
                    else:
                        seg = strip2d_ref[pl.ds(y0, STRIP_ROWS),
                                          pl.ds(x0 * C, PATCH_W * C)]
                    tmp = jax.lax.dot_general(
                        wy48, seg, dimension_numbers=dn,
                        preferred_element_type=jnp.float32,
                    ).reshape(o, PATCH_W, C)
                    pooled = jax.lax.dot_general(
                        wx.astype(jnp.float32), tmp,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    out_ref[k] = jnp.swapaxes(pooled, 0, 1).astype(out_ref.dtype)
        return kern

    def build_call(variant, n, out_dtype=None):
        import jax.numpy as jnp
        if out_dtype is None:
            out_dtype = jnp.bfloat16 if variant.endswith("_bf16o") else jnp.float32
        variant = variant[:-6] if variant.endswith("_bf16o") else variant
        n_groups = n // MINI
        resident_specs = []
        if variant in ("res_slice", "res_gated"):
            resident_specs = [pl.BlockSpec(
                (STRIP_ROWS, W, C), lambda i, *_: (0, 0, 0),
                memory_space=pltpu.VMEM)]
        elif variant == "res_mm":
            resident_specs = [pl.BlockSpec(
                (STRIP_ROWS, W * C), lambda i, *_: (0, 0),
                memory_space=pltpu.VMEM)]
        elif variant == "res_mm_dynrow":
            resident_specs = [pl.BlockSpec(
                (TALL_ROWS, W * C), lambda i, *_: (0, 0),
                memory_space=pltpu.VMEM)]
        elif variant in ("res_mm_slot", "res_mm_full", "res_mm_sw",
                         "res_mm_sw1", "res_mm_clamp", "res_mm_fastslow",
                         "res_mm_rowgate", "res_mm_colgate"):
            resident_specs = [pl.BlockSpec(
                (2, TALL_ROWS, W * C), lambda i, *_: (0, 0, 0),
                memory_space=pltpu.VMEM)]
        elif variant == "res_mm_pre":
            resident_specs = [
                pl.BlockSpec((2, TALL_ROWS, W * C), lambda i, *_: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((MINI, 2, o, STRIP_ROWS),
                             lambda i, *_: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(n_groups,),
            in_specs=[
                pl.BlockSpec((8, 8), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
            ] + resident_specs + [
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (MINI, o, o, C), lambda i, *_: (i, 0, 0, 0),
                memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((MINI, PATCH, PATCH_W, C), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((MINI,)),
            ],
        )
        return pl.pallas_call(
            make_kernel(variant),
            out_shape=jax.ShapeDtypeStruct((n, o, o, C), out_dtype),
            grid_spec=grid_spec,
            interpret=jax.default_backend() != "tpu",
        )

    rng = np.random.RandomState(0)
    strip = jnp.asarray(rng.randn(STRIP_ROWS, W, C), jnp.bfloat16)
    strip2d = strip.reshape(STRIP_ROWS, W * C)
    strip_tall = jnp.asarray(rng.randn(TALL_ROWS, W * C), jnp.bfloat16)
    strip_tall2 = jnp.stack([strip_tall, strip_tall])
    f0 = jnp.asarray(
        rng.randn(1, 200 + PATCH + 1, 336 + PATCH_W + 1, C), jnp.bfloat16)
    n, iters = args.rois, args.iters

    # realistic nrows mix (serving roi distribution, tools/exp_prod_roi):
    # quantiles [13,16,20,24,29,36], mean ~20
    nr_np = np.clip(np.round(np.exp(
        rng.normal(np.log(20.0), 0.35, size=(iters, n)))), 4, PATCH)
    nrows = jnp.asarray(nr_np.astype(np.int32))
    ys = jnp.asarray(
        (rng.randint(0, 2, (iters, n)) * 8).astype(np.int32))
    ysw = jnp.asarray(
        (rng.randint(0, 4, (iters, n)) * 8).astype(np.int32))
    xs = jnp.asarray((rng.randint(0, (W - PATCH_W) // 8, (iters, n)) * 8)
                     .astype(np.int32))
    ysd = jnp.asarray((rng.randint(0, 160, (iters, n)) // 8 * 8)
                      .astype(np.int32))
    xsd = jnp.asarray((rng.randint(0, 280, (iters, n)) // 8 * 8)
                      .astype(np.int32))
    geom = jnp.asarray(
        np.stack([np.full((iters, n), 1.0), np.full((iters, n), 1.0),
                  rng.uniform(1.5, 4.0, (iters, n)),
                  rng.uniform(1.5, 4.0, (iters, n)),
                  np.full((iters, n), -200.0), np.full((iters, n), 400.0),
                  np.full((iters, n), -200.0), np.full((iters, n), 400.0)],
                 -1).astype(np.float32))

    for name in args.variants.split(","):
        base = name[:-6] if name.endswith("_bf16o") else name
        use_ys = ysd if base in ("combined", "dma_floor") else ys
        if base in ("res_mm_dynrow", "res_mm_slot", "res_mm_full",
                    "res_mm_sw", "res_mm_sw1", "res_mm_clamp",
                    "res_mm_fastslow", "res_mm_pre", "res_mm_rowgate",
                    "res_mm_colgate"):
            use_ys = ysw
        use_xs = xsd if base in ("combined", "dma_floor") else xs
        # res_mm_full: nr_ref plays the tile-RANK array — constant zeros so
        # every tile-switch predicate is false at runtime
        use_nr = (jnp.zeros_like(nrows)
                  if base in ("res_mm_full", "res_mm_sw", "res_mm_sw1",
                              "res_mm_fastslow")
                  else nrows)
        if base in ("res_slice", "res_gated"):
            resident = (strip,)
        elif base == "res_mm":
            resident = (strip2d,)
        elif base == "res_mm_dynrow":
            resident = (strip_tall,)
        elif base in ("res_mm_slot", "res_mm_full", "res_mm_sw",
                      "res_mm_sw1", "res_mm_clamp", "res_mm_fastslow",
                      "res_mm_rowgate", "res_mm_colgate"):
            resident = (strip_tall2,)
        elif base == "res_mm_pre":
            wmat = jnp.asarray(
                rng.rand(n, 2, o, STRIP_ROWS).astype(np.float32) / STRIP_ROWS,
                jnp.bfloat16)
            resident = (strip_tall2, wmat)
        else:
            resident = ()
        try:
            call = build_call(name, n)
            n_groups = n // MINI

            @jax.jit
            def f(resident, f0, ys, xs, nrows, geom):
                def body(acc, it):
                    y, x, nr, g = it
                    g = g.reshape(n_groups * 8, 8)
                    out = call(y, x, nr, g, *resident, f0)
                    return acc + jnp.sum(out), ()
                tot, _ = jax.lax.scan(
                    body, jnp.float32(0), (ys, xs, nrows, geom))
                return tot

            use_f0 = (f0.reshape(1, f0.shape[1], -1)
                      if base in ("res_mm_full", "res_mm_sw", "res_mm_sw1",
                                  "res_mm_fastslow")
                      else f0)
            float(f(resident, use_f0, use_ys, use_xs, use_nr, geom))
            t0 = time.perf_counter()
            float(f(resident, use_f0, use_ys, use_xs, use_nr, geom))
            dt = (time.perf_counter() - t0) / iters
            print(f"{name:13s}: {dt*1e3:8.2f} ms / {n} rois  "
                  f"({dt/n*1e6:.3f} us/roi)", flush=True)
        except Exception as e:
            print(f"{name:13s}: FAILED {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:180]}", flush=True)


if __name__ == "__main__":
    main()
