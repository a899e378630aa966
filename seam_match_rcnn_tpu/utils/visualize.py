"""Debug visualizers (matplotlib, optional).

Equivalents of the reference's visual-debug helpers
(/root/reference/stuffs/utils.py:15-212): draw street/shop match pairs,
per-frame tracking boxes, and eval tracklets.  Import-guarded — matplotlib
is only needed when actually plotting.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def _draw_boxes(ax, boxes, color, labels=None):
    import matplotlib.patches as patches

    for i, b in enumerate(np.asarray(boxes).reshape(-1, 4)):
        ax.add_patch(patches.Rectangle(
            (b[0], b[1]), b[2] - b[0], b[3] - b[1],
            linewidth=1.5, edgecolor=color, facecolor="none",
        ))
        if labels is not None:
            ax.text(b[0], b[1] - 2, str(labels[i]), color=color, fontsize=7)


def visualize_matches(
    street_img: np.ndarray, shop_img: np.ndarray,
    street_boxes: np.ndarray, shop_boxes: np.ndarray,
    scores: Optional[np.ndarray] = None, out_path: str = "matches.png",
):
    """Side-by-side street/shop pair with boxes and match scores."""
    plt = _plt()
    fig, axes = plt.subplots(1, 2, figsize=(10, 5))
    axes[0].imshow(np.clip(street_img, 0, 1))
    axes[1].imshow(np.clip(shop_img, 0, 1))
    lbl = None if scores is None else [f"{s:.2f}" for s in np.asarray(scores).ravel()]
    _draw_boxes(axes[0], street_boxes, "lime", lbl)
    _draw_boxes(axes[1], shop_boxes, "red")
    for ax in axes:
        ax.axis("off")
    fig.savefig(out_path, bbox_inches="tight", dpi=120)
    plt.close(fig)
    return out_path


def visualize_tracking(
    frames: Sequence[np.ndarray],
    boxes_per_frame: Sequence[np.ndarray],
    tracklet_ids: Optional[Sequence[np.ndarray]] = None,
    out_path: str = "tracking.png",
    max_frames: int = 10,
):
    """Grid of frames with per-tracklet colored boxes."""
    plt = _plt()
    n = min(len(frames), max_frames)
    fig, axes = plt.subplots(1, n, figsize=(3 * n, 3))
    if n == 1:
        axes = [axes]
    colors = ["lime", "red", "cyan", "yellow", "magenta", "orange"]
    for i in range(n):
        axes[i].imshow(np.clip(frames[i], 0, 1))
        bs = np.asarray(boxes_per_frame[i]).reshape(-1, 4)
        ids = (np.asarray(tracklet_ids[i]).ravel()
               if tracklet_ids is not None else np.zeros(len(bs), int))
        for b, t in zip(bs, ids):
            _draw_boxes(axes[i], b[None], colors[int(t) % len(colors)])
        axes[i].axis("off")
    fig.savefig(out_path, bbox_inches="tight", dpi=120)
    plt.close(fig)
    return out_path
