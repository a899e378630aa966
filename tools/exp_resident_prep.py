"""Where do the resident kernel's non-kernel microseconds go?

bench_roi_resident measures ~1.50 us/roi end-to-end while the kernel-only
probes (tools/exp_roi_resident.py res_mm_*) blend to ~1.32: the difference
must live in the XLA prep the probes never ran — the pyramid pad (a full
HBM copy of all four levels into the tile-grid halo layout), the 44k-key
argsort, the per-rank scatter tables, and the lax.map chunk dispatch.

This harness times, same-session, inside one jit each (scalar-fetch fenced):

  pad        jnp.pad of the 4 FPN levels + 2D reshape (checksum of corners)
  sort       _prep_scalars + tile keys + argsort + gathers + rank scatters
  full       the production pallas_roi_align_resident call
  kernel     full minus (pad + sort), by subtraction

NOTE: pad/sort reproduce the ORIGINAL (pre-2026-08-19) prep pipeline —
full-tile pad margins, stable pair argsort, 7 per-roi gathers — kept as
the historical baseline.  Measured 2026-08-19: pad 5.2 ms, sort 7.2 ms,
full 63.1 ms; after the de-gather/pack rework (PERF.md) full = 55.8 ms
same session.  tools/exp_sort_pack.py splits the sort pipeline further.

Usage: python tools/exp_resident_prep.py [--rois 4000] [--iters 8]
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=11)
    ap.add_argument("--rois", type=int, default=4000)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--chunk", type=int, default=2048)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from seam_match_rcnn_tpu.ops import pallas_roi_align_resident as res
    from seam_match_rcnn_tpu.ops.pallas_roi_align import _prep_scalars
    from _mix import serving_roi_mix

    rng = np.random.RandomState(0)
    b, n = args.batch, args.rois
    shapes = [(200, 336), (100, 168), (50, 84), (25, 42)]
    feats = [jnp.asarray(rng.randn(b, h, w, 256).astype(np.float32),
                         jnp.bfloat16) for h, w in shapes]
    flat = serving_roi_mix(rng, b, n)
    rois = jnp.asarray(flat.reshape(b, n, 4))
    roi_seq = jnp.stack([rois + i for i in range(args.iters)])
    level_shapes = tuple((f.shape[1], f.shape[2]) for f in feats)

    def run_pad(feats, roi_seq):
        def body(acc, r):
            padded = [jnp.pad(f, ((0, 0), (1, res.TILE_H), (1, res.TILE_W),
                                  (0, 0))) for f in feats]
            f2d = [p.reshape(b, p.shape[1], p.shape[2] * 256) for p in padded]
            s = sum(jnp.sum(p[:, ::37, ::53].astype(jnp.float32))
                    for p in f2d)
            # depend on r so the scan can't hoist the pads out of the loop
            return acc + s + jnp.sum(r[0, 0]) * 1e-9, ()
        total, _ = jax.lax.scan(body, jnp.float32(0), roi_seq)
        return total

    def run_sort(feats, roi_seq):
        def body(acc, r):
            flat_rois = r.reshape(b * n, 4)
            img_idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), n)
            lvl, y0i, x0p, _nr, fgeom = _prep_scalars(
                flat_rois, level_shapes, (0.25, 0.125, 0.0625, 0.03125), 7)
            key, ty, tx = res.tile_sort_keys(lvl, y0i, x0p, img_idx,
                                             level_shapes[0])
            order = jnp.argsort(key, stable=True).astype(jnp.int32)
            key_s = key[order]
            geom_s = fgeom[order]
            trow = ((y0i // 8) * 8 - ty * res.ROW_STRIDE)[order]
            tcol = (x0p - tx * res.COL_STRIDE)[order]
            timg_s = img_idx[order]
            tlvl_s = lvl[order]
            trow0_s = (ty * res.ROW_STRIDE)[order]
            tcol0_s = (tx * res.COL_STRIDE)[order]
            nn = b * n
            chg = jnp.concatenate(
                [jnp.ones((1,), jnp.bool_), key_s[1:] != key_s[:-1]])
            rank = jnp.cumsum(chg.astype(jnp.int32)) - 1
            timg_rk = jnp.zeros((nn,), jnp.int32).at[rank].set(timg_s)
            tlvl_rk = jnp.zeros((nn,), jnp.int32).at[rank].set(tlvl_s)
            trow0_rk = jnp.zeros((nn,), jnp.int32).at[rank].set(trow0_s)
            tcol0_rk = jnp.zeros((nn,), jnp.int32).at[rank].set(tcol0_s)
            s = (jnp.sum(geom_s[::97]) +
                 jnp.sum((rank[::97] + trow[::97] + tcol[::97] +
                          timg_rk[::97] + tlvl_rk[::97] + trow0_rk[::97] +
                          tcol0_rk[::97]).astype(jnp.float32)))
            return acc + s, ()
        total, _ = jax.lax.scan(body, jnp.float32(0), roi_seq)
        return total

    def run_full(feats, roi_seq):
        def body(acc, r):
            out, order = res.pallas_roi_align_resident(
                feats, r, 7, 2, interpret=False, roi_chunk=args.chunk,
                out_dtype=jnp.bfloat16)
            return acc + jnp.sum(out[::97, 0, 0, 0].astype(jnp.float32)), ()
        total, _ = jax.lax.scan(body, jnp.float32(0), roi_seq)
        return total

    results = {}
    for name, fn in (("pad", run_pad), ("sort", run_sort), ("full", run_full)):
        jrun = jax.jit(fn)
        out1 = float(jrun(feats, roi_seq))
        t0 = time.perf_counter()
        out2 = float(jrun(feats, roi_seq))
        dt = time.perf_counter() - t0
        assert np.isfinite(out2) and abs(out1 - out2) < 1e-3 * max(abs(out1), 1)
        per_iter_ms = dt / args.iters * 1e3
        us = dt / (args.iters * b * n) * 1e6
        results[name] = us
        print(f"{name:6s}: {per_iter_ms:8.2f} ms/iter  {us:6.3f} us/roi",
              flush=True)
    print(f"kernel-by-subtraction: "
          f"{results['full'] - results['pad'] - results['sort']:.3f} us/roi")


if __name__ == "__main__":
    main()
