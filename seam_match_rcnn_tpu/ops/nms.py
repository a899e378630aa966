"""Padded, static-shape greedy NMS for TPU.

TPU-native replacement for ``torchvision.ops.nms`` / ``batched_nms`` (CUDA)
used by the reference at /root/reference/models/matchrcnn.py:322 and inside
the torchvision RPN.  XLA needs static shapes, so instead of returning a
variable-length index list we return a fixed-size ``(indices, mask)`` pair.

Algorithm: *exact* greedy NMS, evaluated tile-by-tile in score order.

* Boxes are sorted by score (descending) and processed in tiles of ``T``.
* A tile is first suppressed by the already-finalized kept boxes of earlier
  tiles (single pass — exact, since earlier decisions are final).
* Within the tile, the greedy recursion ``kept[i] = ~∃ j<i: kept[j] ∧
  iou(i,j) > t`` is solved by Jacobi iteration to fixpoint.  The fixpoint is
  unique (induction over the score order) and equals the greedy solution, so
  the whole procedure is exact, not an approximation.  Convergence takes at
  most T steps and typically <10.

Work is O(N²) elementwise on the VPU in [T, N] blocks with sequential depth
O(N/T) — versus O(N) sequential depth for the naive while-loop formulation.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .boxes import box_iou

_NEG_INF = -1e10


from .pallas_kernels import _round_up  # shared alignment helper


def _self_suppress(conflict: jnp.ndarray, alive: jnp.ndarray) -> jnp.ndarray:
    """Solve kept[i] = alive[i] & ~any_{j<i}(kept[j] & conflict[i, j]).

    conflict: [T, T] bool, True where iou > threshold (diagonal irrelevant).
    alive:    [T] bool, boxes not already suppressed by earlier tiles.
    """
    t = conflict.shape[0]
    # Only earlier (higher-score) boxes can suppress: strict lower triangle.
    row = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
    conflict = conflict & (col < row)

    def step(kept):
        return alive & ~jnp.any(conflict & kept[None, :], axis=1)

    def cond(state):
        kept, prev, it = state
        return jnp.any(kept != prev) & (it < t)

    def body(state):
        kept, _, it = state
        return step(kept), kept, it + 1

    init = step(alive)
    kept, _, _ = jax.lax.while_loop(cond, body, (step(init), init, jnp.int32(0)))
    return kept


def _greedy_kept(boxes, scores, valid, iou_threshold, tile_size):
    """Core tiled greedy pass.  Returns (kept [N_pad] bool in score order,
    order [N] the sort permutation, pad)."""
    n = boxes.shape[0]
    # clamp to >= 8: n == 0 would give t = 0 and a div-by-zero in the pad
    # round-up (a zero-sized level segment is a legal static shape)
    t = min(tile_size, max(_round_up(n, 8), 8))
    n_pad = max(_round_up(n, t), t)

    order = jnp.argsort(-scores)  # stable; invalid sink to the end
    sboxes = boxes[order]
    svalid = valid[order]

    pad = n_pad - n
    if pad:
        sboxes = jnp.pad(sboxes, ((0, pad), (0, 0)))
        svalid = jnp.pad(svalid, (0, pad))

    num_tiles = n_pad // t
    positions = jnp.arange(n_pad)

    def tile_body(i, kept_global):
        start = i * t
        tile_boxes = jax.lax.dynamic_slice(sboxes, (start, 0), (t, 4))
        tile_valid = jax.lax.dynamic_slice(svalid, (start,), (t,))
        iou_all = box_iou(tile_boxes, sboxes)  # [T, N_pad]
        conflict_all = iou_all > iou_threshold
        prev_kept = kept_global & (positions < start)
        cross = jnp.any(conflict_all & prev_kept[None, :], axis=1)
        alive = tile_valid & ~cross
        conflict_self = jax.lax.dynamic_slice(conflict_all, (0, start), (t, t))
        tile_kept = _self_suppress(conflict_self, alive)
        return jax.lax.dynamic_update_slice(kept_global, tile_kept, (start,))

    kept = jax.lax.fori_loop(
        0, num_tiles, tile_body, jnp.zeros((n_pad,), dtype=bool)
    )
    return kept, order, pad


@functools.partial(jax.jit, static_argnames=("max_output", "tile_size"))
def nms_padded(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
    max_output: int,
    valid: Optional[jnp.ndarray] = None,
    tile_size: int = 256,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact greedy NMS with fixed-size output.

    Args:
      boxes:  [N, 4] xyxy.
      scores: [N].
      iou_threshold: suppression threshold.
      max_output: number of indices to return (pad with -1 beyond kept).
      valid: optional [N] bool; False entries never kept and never suppress.
      tile_size: processing tile (rounded VPU-friendly).

    Returns:
      indices: [max_output] int32 into the input arrays, score-ordered,
               -1 padded.
      mask:    [max_output] bool, True where indices are real.
    """
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    scores = jnp.where(valid, scores, _NEG_INF)
    kept, order, pad = _greedy_kept(boxes, scores, valid, iou_threshold,
                                    tile_size)

    # Compact kept positions (already in score order) into [max_output].
    rank = jnp.cumsum(kept.astype(jnp.int32)) - 1
    slot = jnp.where(kept & (rank < max_output), rank, max_output)
    out = jnp.full((max_output + 1,), -1, dtype=jnp.int32)
    orig = jnp.pad(order.astype(jnp.int32), (0, pad), constant_values=-1)
    out = out.at[slot].set(orig, mode="drop")
    indices = out[:max_output]
    return indices, indices >= 0


@functools.partial(jax.jit, static_argnames=("tile_size",))
def nms_kept_mask(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
    valid: Optional[jnp.ndarray] = None,
    tile_size: int = 256,
) -> jnp.ndarray:
    """Exact greedy NMS returning the survivor mask in ORIGINAL order.

    Cheaper than nms_padded when the caller does its own top-k afterwards
    (e.g. per-FPN-level RPN NMS merged by a global score top-k — boxes on
    different levels never suppress each other, so running one NMS per
    contiguous level segment does 1/L of the offset-trick's O((LK)²) IoU
    work; torchvision semantics at
    /root/reference/models/matchrcnn.py:16-19 via RegionProposalNetwork).
    """
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    scores = jnp.where(valid, scores, _NEG_INF)
    kept, order, pad = _greedy_kept(boxes, scores, valid, iou_threshold,
                                    tile_size)
    del pad
    return jnp.zeros((n,), dtype=bool).at[order].set(kept[:n])


def batched_nms_padded(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    idxs: jnp.ndarray,
    iou_threshold: float,
    max_output: int,
    valid: Optional[jnp.ndarray] = None,
    tile_size: int = 256,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Category-aware NMS via the coordinate-offset trick, as in
    ``torchvision.ops.boxes.batched_nms`` (used for per-class detection NMS at
    /root/reference/models/matchrcnn.py:322 and per-level RPN NMS).

    idxs: [N] int — boxes with different idxs never suppress each other.
    """
    max_coord = jnp.max(jnp.where(valid[:, None] if valid is not None else True, boxes, 0.0))
    offsets = idxs.astype(boxes.dtype) * (max_coord + 1.0)
    shifted = boxes + offsets[:, None]
    return nms_padded(shifted, scores, iou_threshold, max_output, valid, tile_size)
