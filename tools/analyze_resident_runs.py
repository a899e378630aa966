"""Host-side run-structure analysis of the tile-resident RoIAlign stream.

Computes, for the serving roi mix at serving geometry (the same
distribution tools/bench_roi_resident.py times), the statistics that
determine the fast/slow-path split of the resident kernel
(ops/pallas_roi_align_resident.py):

  * tiles touched / rois per tile (run-length distribution),
  * fraction of MINI=8 groups whose rank changes (slow path) vs not
    (fast path: zero per-roi branches),
  * unique tile DMA bytes vs the production patch-DMA kernel's summed
    window bytes (the HBM-byte lever on bandwidth-bound hardware).

Pure numpy + the kernel's own _prep_scalars on the CPU backend — runs
without the TPU tunnel.

Usage: python tools/analyze_resident_runs.py [--rois 4000] [--batch 11]
"""

import argparse
import sys

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=11)
    ap.add_argument("--rois", type=int, default=4000)
    ap.add_argument("--chunk", type=int, default=2048)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--output-size", type=int, default=7,
                    help="RoIAlign output size — feeds tile_geometry "
                    "(f32 at >7 narrows the tiles to [72, 80] @ 32)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")  # sitecustomize-proof
    import jax.numpy as jnp
    import numpy as np

    from seam_match_rcnn_tpu.ops.pallas_roi_align import (
        PATCH, PATCH_W, _prep_scalars)
    from seam_match_rcnn_tpu.ops import pallas_roi_align_resident as res

    from _mix import serving_roi_mix

    rng = np.random.RandomState(0)
    b, n = args.batch, args.rois
    shapes = ((200, 336), (100, 168), (50, 84), (25, 42))
    scales = (0.25, 0.125, 0.0625, 0.03125)

    # the shared serving roi mix (identical to tools/bench_roi_resident.py)
    rois = serving_roi_mix(rng, b, n)

    lvl, y0i, x0p, _nr, _g = _prep_scalars(
        jnp.asarray(rois), shapes, scales, args.output_size)
    lvl, y0i, x0p = map(np.asarray, (lvl, y0i, x0p))
    img = np.repeat(np.arange(b), n)

    wide = args.dtype == "bfloat16"
    itemsize = 2 if wide else 4
    # the kernel's own geometry rule (output-size-aware since round 4: f32
    # at >7x7 outputs narrows to [72, 80] @ 32) — reusing tile_geometry
    # keeps this analysis from drifting when the rule changes
    tile_w, col_stride = res.tile_geometry(itemsize, args.output_size)

    # the kernel's own tile assignment (shared helper — cannot drift)
    key, _ty, _tx = res.tile_sort_keys(lvl, y0i, x0p, img, shapes[0],
                                       wide=wide, col_stride=col_stride)
    key_s = np.sort(key)

    # dense rank + run lengths
    chg = np.concatenate([[True], key_s[1:] != key_s[:-1]])
    rank = np.cumsum(chg) - 1
    n_tiles = rank[-1] + 1
    runs = np.bincount(rank)

    # chunking replicates the kernel's lax.map: pad to chunk multiple (edge)
    total = b * n
    pad = (-total) % args.chunk
    rank_p = np.concatenate([rank, np.full(pad, rank[-1])])
    groups = rank_p.reshape(-1, res.MINI)
    # group g is SLOW iff rank changes across [last of g-1, last of g]
    # (or g is program 0 of its chunk)
    last = groups[:, -1]
    prev = np.concatenate([[last[0]], last[:-1]])
    slow = last != prev
    gpc = args.chunk // res.MINI  # groups per chunk
    slow[0::gpc] = True  # program 0 of each chunk runs the init/slow path
    n_groups = len(groups)

    tile_bytes = n_tiles * res.TILE_H * tile_w * 256 * itemsize
    patch_bytes = total * PATCH * PATCH_W * 256 * itemsize

    print(f"rois                 : {total}  ({b} images x {n})")
    print(f"tiles touched        : {n_tiles}  "
          f"(mean run {total/n_tiles:.1f} rois; "
          f"p50/p90/max run {int(np.percentile(runs,50))}/"
          f"{int(np.percentile(runs,90))}/{runs.max()})")
    print(f"singleton runs       : {(runs==1).sum()} "
          f"({(runs==1).mean()*100:.1f}% of tiles)")
    print(f"MINI groups          : {n_groups}; slow-path "
          f"{slow.sum()} ({slow.mean()*100:.1f}%), fast-path "
          f"{(~slow).sum()} ({(~slow).mean()*100:.1f}%)")
    print(f"resident DMA bytes   : {tile_bytes/1e6:.1f} MB "
          f"({tile_bytes/total:.0f} B/roi)")
    print(f"patch-DMA bytes      : {patch_bytes/1e6:.1f} MB "
          f"({patch_bytes/total:.0f} B/roi)  "
          f"ratio {patch_bytes/tile_bytes:.1f}x")


if __name__ == "__main__":
    main()
