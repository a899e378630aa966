"""Region proposal network: proposal selection with static shapes.

TPU-native re-design of torchvision's ``RegionProposalNetwork`` (held, with
overridden top-n params, by the reference model:
/root/reference/models/matchrcnn.py:16-19).  The dynamic filter/NMS pipeline
becomes: per-level top-k → decode → clip → validity masks → padded
level-batched NMS → fixed [R, 4] proposal tensor + mask.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..config import RPNConfig
from ..ops import boxes as box_ops
from ..ops.nms import nms_kept_mask


def flatten_rpn_outputs(
    objectness: Sequence[jnp.ndarray], regressions: Sequence[jnp.ndarray]
) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
    """[B, H, W, A] / [B, H, W, 4A] per level -> [B, N_l] / [B, N_l, 4]."""
    logits, deltas = [], []
    for o, r in zip(objectness, regressions):
        b = o.shape[0]
        logits.append(o.reshape(b, -1))
        deltas.append(r.reshape(b, -1, 4))
    return logits, deltas


def select_proposals(
    objectness: Sequence[jnp.ndarray],
    regressions: Sequence[jnp.ndarray],
    anchors: Sequence[jnp.ndarray],
    image_sizes: jnp.ndarray,
    cfg: RPNConfig,
    training: bool,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Generate proposals for a batch.

    Args:
      objectness/regressions: per-level RPN head outputs [B, H, W, A(*4)].
      anchors: per-level [N_l, 4] canvas anchors.
      image_sizes: [B, 2] valid (h, w) per image inside the canvas.

    Returns:
      proposals [B, R, 4], scores [B, R], valid [B, R]
      with R = post_nms_top_n.
    """
    logits, deltas = flatten_rpn_outputs(objectness, regressions)
    pre_n = cfg.pre_nms_top_n(training)
    post_n = cfg.post_nms_top_n(training)

    cand_boxes, cand_scores = [], []
    for lg, dl, anc in zip(logits, deltas, anchors):
        k = min(pre_n, lg.shape[1])
        top_scores, top_idx = jax.lax.top_k(lg, k)  # [B, k]
        top_deltas = jnp.take_along_axis(dl, top_idx[..., None], axis=1)
        top_anchors = anc[top_idx]  # [B, k, 4]
        boxes = box_ops.decode_boxes(top_deltas, top_anchors, (1.0, 1.0, 1.0, 1.0))
        cand_boxes.append(boxes)
        cand_scores.append(top_scores)

    boxes = jnp.concatenate(cand_boxes, axis=1)      # [B, K, 4]
    scores = jnp.concatenate(cand_scores, axis=1)    # [B, K]
    seg_sizes = [b.shape[1] for b in cand_boxes]     # static per-level counts

    def per_image(bx, sc, size):
        bx = box_ops.clip_boxes_to_image(bx, size)
        keep = box_ops.small_box_mask(bx, cfg.min_size)
        # torchvision thresholds the sigmoid probability (default 0.0 keeps
        # everything); ranking can stay on raw logits (monotonic).
        keep &= jax.nn.sigmoid(sc) > cfg.score_thresh
        # Per-level NMS over the contiguous level segments (boxes on
        # different levels never suppress each other), merged by one global
        # score top-k — identical survivor set to torchvision's offset-trick
        # batched NMS at 1/L of its O((L·K)²) IoU work.
        kept_segs = []
        off = 0
        for k_l in seg_sizes:
            kept_segs.append(nms_kept_mask(
                bx[off:off + k_l], sc[off:off + k_l], cfg.nms_thresh,
                valid=keep[off:off + k_l],
            ))
            off += k_l
        kept = jnp.concatenate(kept_segs)
        ranked = jnp.where(kept, sc, -jnp.inf)
        k = min(post_n, ranked.shape[0])  # tiny canvases: K < post_n
        top_sc, top_idx = jax.lax.top_k(ranked, k)
        if k < post_n:
            top_sc = jnp.pad(top_sc, (0, post_n - k), constant_values=-jnp.inf)
            top_idx = jnp.pad(top_idx, (0, post_n - k))
        mask = top_sc > -jnp.inf
        return bx[top_idx], sc[top_idx], mask

    return jax.vmap(per_image)(boxes, scores, image_sizes)
