"""Same-session A/B: tile-resident vs production patch-DMA RoIAlign.

Times both kernels on the serving roi mix (log-uniform scale, anchor
aspects) at serving geometry (11 x 800x1344 canvas, 4000 rois/frame, bf16,
C=256), inside one jit with scalar-fetch fencing.  Also cross-checks that
the resident output (unsorted) matches the production kernel's on a sample
of rois.

Usage: python tools/bench_roi_resident.py [--rois 4000] [--iters 4]
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=11)
    ap.add_argument("--rois", type=int, default=4000)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--chunk", type=int, default=2048)
    ap.add_argument("--single-tile", action="store_true",
                    help="confine rois to one FPN tile: isolates the "
                    "resident kernel's per-roi cost (no tile switches, "
                    "constant buffer slot, one DMA) from tile logistics")
    ap.add_argument("--pieces", default=None,
                    help="matmul-gate pieces for the resident kernel as "
                    "'rows/cols', e.g. '24,36,48/24,36,48'; 'off' = ungated "
                    "(48/48); default = kernel default")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    import functools

    from seam_match_rcnn_tpu.ops.pallas_roi_align import pallas_roi_align_batched
    from seam_match_rcnn_tpu.ops import pallas_roi_align_resident as resmod

    pallas_roi_align_resident = resmod.pallas_roi_align_resident
    if args.pieces == "off":
        pallas_roi_align_resident = functools.partial(
            pallas_roi_align_resident,
            row_pieces=(resmod.WIN_H,), col_pieces=(resmod.PATCH_W,))
    elif args.pieces:
        rp, cp = (tuple(int(x) for x in part.split(","))
                  for part in args.pieces.split("/"))
        pallas_roi_align_resident = functools.partial(
            pallas_roi_align_resident, row_pieces=rp, col_pieces=cp)

    rng = np.random.RandomState(0)
    b = args.batch
    shapes = [(200, 336), (100, 168), (50, 84), (25, 42)]
    feats = [jnp.asarray(rng.randn(b, h, w, 256).astype(np.float32),
                         jnp.bfloat16) for h, w in shapes]

    n = args.rois
    if args.single_tile:
        # everything maps to P2 tile (ty=0, tx=0) of image 0: boxes < 56 px
        # (level 0 band) inside the top-left 100x260 px region
        rng.randint(0, 3, b * n)  # keep the rng stream aligned with the
        rng.randn(b * n)          # prior draw order (recorded numbers)
        rng.uniform(np.log(16.0), np.log(760.0), b * n)
        a = np.exp(rng.randn(b * n) * 0.1)
        s = np.exp(rng.uniform(np.log(24.0), np.log(52.0), b * n))
        bh, bw = s * np.sqrt(a), s / np.sqrt(a)
        cy = rng.uniform(26, 74, b * n)
        cx = rng.uniform(26, 230, b * n)
        x1 = np.clip(cx - bw / 2, 0, 1343)
        y1 = np.clip(cy - bh / 2, 0, 799)
        x2 = np.clip(cx + bw / 2, x1 + 1, 1344)
        y2 = np.clip(cy + bh / 2, y1 + 1, 800)
        flat = np.stack([x1, y1, x2, y2], 1).astype(np.float32)
    else:
        from _mix import serving_roi_mix

        flat = serving_roi_mix(rng, b, n)
    rois = jnp.asarray(flat.reshape(b, n, 4))
    roi_seq = jnp.stack([rois + i for i in range(args.iters)])

    def run_prod(feats, roi_seq):
        def body(acc, r):
            out = pallas_roi_align_batched(
                feats, r, 7, 2, interpret=False, roi_chunk=args.chunk,
                out_dtype=jnp.bfloat16)
            return acc + jnp.sum(out[:, ::97, 0, 0, 0].astype(jnp.float32)), ()
        total, _ = jax.lax.scan(body, jnp.float32(0), roi_seq)
        return total

    def run_res(feats, roi_seq):
        def body(acc, r):
            out, order = pallas_roi_align_resident(
                feats, r, 7, 2, interpret=False, roi_chunk=args.chunk,
                out_dtype=jnp.bfloat16)
            # same sampled reduction as production, via the permutation
            flat_idx = jnp.arange(0, b * n, 97)
            inv = jnp.zeros((b * n,), jnp.int32).at[order].set(
                jnp.arange(b * n, dtype=jnp.int32))
            vals = out[inv[flat_idx], 0, 0, 0].astype(jnp.float32)
            return acc + jnp.sum(vals), ()
        total, _ = jax.lax.scan(body, jnp.float32(0), roi_seq)
        return total

    results = {}
    for name, fn in (("production", run_prod), ("resident", run_res)):
        jrun = jax.jit(fn)
        out1 = float(jrun(feats, roi_seq))
        t0 = time.perf_counter()
        out2 = float(jrun(feats, roi_seq))
        dt = time.perf_counter() - t0
        assert np.isfinite(out2) and abs(out1 - out2) < 1e-3 * max(abs(out1), 1)
        us = dt / (args.iters * b * n) * 1e6
        results[name] = (us, out1)
        print(f"{name:10s}: {dt * 1e3:8.1f} ms -> {us:.3f} us/roi "
              f"(checksum {out1:.4f})", flush=True)

    # numeric cross-check on one batch (sampled rois, unsorted comparison)
    prod = pallas_roi_align_batched(
        feats, rois, 7, 2, interpret=False, roi_chunk=args.chunk,
        out_dtype=jnp.bfloat16)
    res, order = pallas_roi_align_resident(
        feats, rois, 7, 2, interpret=False, roi_chunk=args.chunk,
        out_dtype=jnp.bfloat16)
    sample = np.asarray(order[::311])
    got = np.asarray(res[::311].astype(jnp.float32))
    want = np.asarray(
        prod.reshape(b * n, 7, 7, 256)[sample].astype(jnp.float32))
    err = np.max(np.abs(got - want))
    print(f"max |resident - production| on {len(sample)} sampled rois: "
          f"{err:.5f} (one extra bf16 rounding expected, <= ~4e-2 on N(0,1))")
    pu, ru = results["production"][0], results["resident"][0]
    print(f"resident is {pu / ru:.3f}x production "
          f"({pu:.3f} -> {ru:.3f} us/roi)")


if __name__ == "__main__":
    main()
