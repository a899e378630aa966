"""Quantify the Pallas RoIAlign patch-window approximation (VERDICT r1 #2).

Measures the fraction of rois flagged by ``footprint_clamp_mask`` (i.e.
whose bilinear footprint overflows the 40x48 patch and clamps) under:

  1. an analytic sweep of the (band-position, aspect-ratio) plane — the
     exact boundary of the approximation;
  2. an anchor-shaped random distribution: aspect ratios {0.5, 1, 2}
     (the RPN anchor set, /root/reference/models/matchrcnn.py:15) with
     log-normal jitter (regression deltas), log-uniform scales, at the
     parity eval geometry (800x1344 canvas);
  3. (--detector) the real serving pipeline's rois: RPN post-NMS proposals
     of the actual model on synthetic eval frames.

Usage: python tools/measure_roi_clamp.py [--detector] [--n 200000]
"""

import argparse
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

CANVAS = (800, 1344)
LEVEL_SHAPES = tuple((CANVAS[0] // s, CANVAS[1] // s) for s in (4, 8, 16, 32))


def clamp_mask(rois):
    import jax.numpy as jnp

    from seam_match_rcnn_tpu.ops.pallas_roi_align import footprint_clamp_mask

    return np.asarray(footprint_clamp_mask(
        jnp.asarray(rois, jnp.float32), LEVEL_SHAPES, output_size=7))


def analytic_boundary():
    """For band positions s_cells in [14, 28), find the smallest aspect that
    clamps (footprint is output_size-independent: out*bin == roi extent)."""
    print("band position (sqrt-area cells at level) -> min clamping aspect")
    s_vals = (14, 16, 18, 20, 22, 24, 26, 27.9)
    aspects = np.exp(np.linspace(0.0, np.log(16.0), 400))
    rois = []
    for s_cells in s_vals:
        s_px = s_cells * 4.0  # place at P2
        h = s_px * np.sqrt(aspects)
        w = s_px / np.sqrt(aspects)
        rois.append(np.stack(
            [np.full_like(h, 600.0), np.full_like(h, 4.0),
             600.0 + w, 4.0 + h], 1))
    mask = clamp_mask(np.concatenate(rois)).reshape(len(s_vals), -1)
    for s_cells, row in zip(s_vals, mask):
        a = aspects[row][0] if row.any() else float("inf")
        print(f"  s={s_cells:5.1f} cells: aspect >= {a:.2f} clamps "
              f"(footprint {s_cells * np.sqrt(a):.1f} cells)")


def anchor_distribution(n, jitter_sigma):
    rng = np.random.RandomState(0)
    h_img, w_img = CANVAS
    base_aspects = np.asarray([0.5, 1.0, 2.0])[rng.randint(0, 3, n)]
    a = base_aspects * np.exp(rng.randn(n) * jitter_sigma)
    s = np.exp(rng.uniform(np.log(16.0), np.log(800.0), n))
    bh = s * np.sqrt(a)
    bw = s / np.sqrt(a)
    cy = rng.uniform(0, h_img, n)
    cx = rng.uniform(0, w_img, n)
    x1 = np.clip(cx - bw / 2, 0, w_img - 1)
    y1 = np.clip(cy - bh / 2, 0, h_img - 1)
    x2 = np.clip(cx + bw / 2, x1 + 1, w_img)
    y2 = np.clip(cy + bh / 2, y1 + 1, h_img)
    return np.stack([x1, y1, x2, y2], 1).astype(np.float32)


def detector_rois():
    """Post-NMS proposals + detections from the real serving pipeline on
    synthetic eval frames."""
    import jax
    import jax.numpy as jnp

    from seam_match_rcnn_tpu.config import serving_model_config
    from seam_match_rcnn_tpu.models.matchrcnn import MatchRCNN, init_model

    cfg = serving_model_config()
    model, variables = init_model(cfg, video=True, canvas=(256, 320))
    rng = np.random.RandomState(7)
    images = jnp.asarray(rng.rand(4, 256, 320, 3).astype(np.float32))
    sizes = jnp.asarray([[256, 320]] * 4, jnp.int32)

    @jax.jit
    def fwd(v, im, sz):
        return model.apply(v, im, sz, method=MatchRCNN.inference,
                           with_masks=False, with_match=False,
                           with_roi_features=False)

    out = fwd(variables, images, sizes)
    boxes = np.asarray(out["boxes"]).reshape(-1, 4)
    valid = np.asarray(out["valid"]).reshape(-1)
    return boxes[valid]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200000)
    ap.add_argument("--jitter", type=float, default=0.2)
    ap.add_argument("--detector", action="store_true")
    args = ap.parse_args()

    analytic_boundary()

    for sigma in (0.0, args.jitter, 0.4):
        rois = anchor_distribution(args.n, sigma)
        frac = clamp_mask(rois).mean()
        print(f"anchor distribution (jitter sigma={sigma}): "
              f"clamp fraction = {frac:.2e}  ({int(frac * args.n)}/{args.n})")

    if args.detector:
        rois = detector_rois()
        frac = clamp_mask(rois).mean()
        print(f"detector detections ({len(rois)} boxes): "
              f"clamp fraction = {frac:.2e}")


if __name__ == "__main__":
    main()
