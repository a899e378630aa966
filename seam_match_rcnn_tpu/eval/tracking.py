"""Greedy eval-time tracking (host side).

Re-implementation of the tracklet construction in the MovingFashion eval
(/root/reference/evaluate_movingfashion.py:165-214).  The algorithm is
inherently sequential/greedy (SURVEY.md §7.3), so it stays on host; the
self-similarity matrix it consumes is computed on device.

Semantics: repeatedly seed a tracklet with the highest-detection-score
unclaimed box; greedily extend it with the best match-head self-similarity
box from a not-yet-covered frame while the similarity exceeds the tracking
threshold; the tracklet whose boxes best overlap the annotated GT tracklet
(summed per-box max IoU) is selected for scoring — the reference's oracle
selection.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

from ..ops import boxes as box_ops
import jax.numpy as jnp


def build_tracklets(
    self_sim: np.ndarray,
    det_scores: np.ndarray,
    img_of_box: np.ndarray,
    tracking_threshold: float,
) -> List[List[int]]:
    """self_sim: [N, N] match probabilities between the product's street
    boxes; det_scores: [N] detection scores; img_of_box: [N] frame index of
    each box.  Returns tracklets as lists of box indices (into 0..N)."""
    n = self_sim.shape[0]
    unique_imgs = np.unique(img_of_box)
    taken = np.zeros(n, dtype=bool)
    tracklets: List[List[int]] = []
    while not taken.all():
        free = np.nonzero(~taken)[0]
        start = free[np.argmax(det_scores[free])]
        track = [int(start)]
        track_imgs = {int(img_of_box[start])}
        frames_to_check = [i for i in unique_imgs if i not in track_imgs]
        while frames_to_check:
            cand = np.asarray(
                [i for i in range(n)
                 if not taken[i] and i not in track and img_of_box[i] in frames_to_check]
            )
            if cand.size == 0:
                break
            sub = self_sim[np.asarray(track)][:, cand]
            r, c = np.unravel_index(int(np.argmax(sub)), sub.shape)
            if sub[r, c] > tracking_threshold:
                j = int(cand[c])
                track.append(j)
                track_imgs.add(int(img_of_box[j]))
                frames_to_check = [i for i in frames_to_check if i not in track_imgs]
            else:
                break
        for i in track:
            taken[i] = True
        tracklets.append(track)
    return tracklets


def select_tracklet(
    tracklets: Sequence[Sequence[int]],
    boxes: np.ndarray,
    img_of_box: np.ndarray,
    gt_tracklet_per_img: np.ndarray,
) -> int:
    """Oracle tracklet pick (evaluate_movingfashion.py:202-213): summed
    per-box max IoU vs the annotated GT tracklet boxes of each frame."""
    ious = []
    for track in tracklets:
        pred = boxes[np.asarray(track)]
        gt = np.stack([gt_tracklet_per_img[img_of_box[i]] for i in track])
        iou = np.asarray(box_ops.box_iou(jnp.asarray(pred), jnp.asarray(gt)))
        ious.append(float(np.sum(np.max(iou, axis=-1))))
    return int(np.argmax(np.asarray(ious)))
