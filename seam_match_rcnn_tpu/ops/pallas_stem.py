"""Fused conv1+BN+relu+maxpool ResNet stem — Pallas TPU kernel (round 5).

XLA runs the stem as conv -> 378 MB stride-2 activation round-trip ->
reduce_window: measured 16.0-16.5 ms/batch-11 at serving geometry (conv1
alone 14.4 — both streaming-bound).  This kernel computes the whole stem
tail without the conv activation ever leaving VMEM, with the
constructions the round-5 probe validated (tools/exp_stem_im2col.py:
pool_fused_stem 9.06 ms/batch-11 vs XLA conv1+pool 16.49):

  * input in space-to-depth CHANNEL-MAJOR layout [12, H/2, W/2] per
    image (channels = 2x2 pixel phase x RGB), so the 7x7/s2 conv becomes
    a 4x4/s1 conv whose x-taps are dot_generals contracting the 48
    SUBLANES of a [48, lanes] slab — no im2col, no lane-split reshape
    (the round-2 killers);
  * x-tap alignment via lane rolls (pltpu.roll, non-negative shifts);
  * BN folded into the rearranged weights + bias; relu in-kernel; lanes
    beyond the valid width masked to zero so pool windows and roll wraps
    can never read garbage;
  * the 3x3/s2/p1 maxpool is a centered 3-lane rolled max + a one-hot
    even-lane selection matmul, fused on conv rows still in registers.
    Zero padding is exact here: relu outputs are >= 0, so max with a
    0-pad equals torchvision's -inf-pad window.

The pool-select matmul contracts one-hot-first so each strip stores
[outw, 64] — the kernel's output IS NHWC; no XLA transpose follows (the
first integration's end-to-end wash, 79.5 vs 79.7 fps, traced to that
~380 MB/batch transpose round-trip eating the kernel's 7 ms win).

Replaces the stem of the reference's torchvision resnet50 backbone
(/root/reference/models/matchrcnn.py:486 resnet_fpn_backbone: conv1 +
FrozenBN + relu + maxpool).  Inference path; the stem is frozen in
training anyway (trainable_layers=3) and phase-1 keeps the XLA stem.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

STRIP = 8               # pooled rows per grid program
CONVR = 2 * STRIP + 1   # conv rows a strip consumes (pool pad 1, stride 2)
S2DR = CONVR + 3        # s2d rows a strip consumes (4-row conv window)


def rearrange_stem_weights(conv_w, bn_scale, bn_shift):
    """conv1 [7, 7, 3, 64] (HWIO) + folded FrozenBN -> (W2 [4, 48, 64],
    bias [64]) in the kernel's slab layout.

    Original pixel row 2y + ky (ky in [-3, 3]) lives at s2d row
    y + qy - 2, phase py, with ky = 2*qy + py - 4; the 7-tap weight index
    is ky + 3 = 2*qy + py - 1 (same for x).  Slab rows are (c2, qy)
    pairs, c2-major — W2[qx][c2 * 4 + qy] must match (_stem_kernel
    reshapes x_ref[:, y:y+4, :] to [48, lanes])."""
    w = jnp.asarray(conv_w, jnp.float32) * jnp.asarray(
        bn_scale, jnp.float32)[None, None, None, :]
    out = jnp.zeros((4, 4, 12, 64), jnp.float32)
    for qy in range(4):
        for py in range(2):
            iy = 2 * qy + py - 1
            if not 0 <= iy < 7:
                continue
            for qx in range(4):
                for px in range(2):
                    ix = 2 * qx + px - 1
                    if not 0 <= ix < 7:
                        continue
                    c2 = (py * 2 + px) * 3
                    out = out.at[qy, qx, c2:c2 + 3].set(w[iy, ix])
    w2 = jnp.transpose(out, (1, 2, 0, 3)).reshape(4, 48, 64)
    return w2, jnp.asarray(bn_shift, jnp.float32)


def _stem_kernel(x_ref, w_ref, s2_ref, b_ref, out_ref, *, lanes, w2_cols):
    """One strip: x_ref [1, 1, 12, S2DR, lanes] (s2d channel-major, both
    axes pre-padded by 2), w_ref [4, 48, 64], s2_ref [lanes, outw]
    one-hot even-lane select, b_ref [1, 64] -> out_ref [1, STRIP, outw,
    64] (NHWC minor dims).  ``w2_cols`` = valid conv columns (lanes
    beyond it masked)."""
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, lanes), 1)
    mask = (cols < w2_cols).astype(jnp.float32)
    # a strip's conv row 0 is ABSOLUTE row (strip * 16) - 1: for the first
    # strip that is the pool's top pad row, which torchvision pads with
    # -inf — it must contribute NOTHING, but this kernel would compute a
    # fake conv of the zero-padded input (relu(bias + ...) != 0).  Zero it.
    row0_live = (pl.program_id(1) > 0).astype(jnp.float32)
    rows = []
    for y in range(CONVR):
        slab = x_ref[0, 0, :, y:y + 4, :].reshape(48, lanes)
        acc = None
        for qx in range(4):
            u = jax.lax.dot_general(
                w_ref[qx], slab,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)       # [64, lanes]
            u = pltpu.roll(u, lanes - qx, 1) if qx else u
            acc = u if acc is None else acc + u
        r = jnp.maximum(acc + b_ref[0][:, None], 0.0) * mask
        if y == 0:
            r = r * row0_live
        rows.append(r)
    for p in range(STRIP):
        m = jnp.maximum(jnp.maximum(rows[2 * p], rows[2 * p + 1]),
                        rows[2 * p + 2])
        # centered 3-lane window: max(m[x-1], m[x], m[x+1]); the wraps
        # land on masked-zero lanes, and relu outputs >= 0 absorb them
        m = jnp.maximum(jnp.maximum(m, pltpu.roll(m, 1, 1)),
                        pltpu.roll(m, lanes - 1, 1))
        # contract the one-hot select the other way round so the store is
        # already [outw, 64] = NHWC minor dims — no XLA transpose after
        # the kernel (the first integration's 79.5-vs-79.7 wash traced to
        # exactly that ~380 MB/batch HBM round-trip)
        out_ref[0, p] = jax.lax.dot_general(
            s2_ref[:], m.astype(jnp.bfloat16),
            dimension_numbers=(((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_stem(x, conv_w, bn_scale, bn_shift, interpret="auto"):
    """x [B, H, W, 3] (normalized, H, W multiples of 4) ->
    [B, H//4, W//4, 64] f32, equal to
    maxpool3x3s2p1(relu(bn1(conv1_7x7s2p3(x))))."""
    if interpret == "auto":
        interpret = jax.default_backend() != "tpu"
    b, h, w, _ = x.shape
    h2, w2 = h // 2, w // 2
    outh, outw = h // 4, w // 4
    # space-to-depth, channel-major: [B, 12, H/2, W/2].  Cast bf16 BEFORE
    # the shuffle — identical values (the kernel consumes bf16 either
    # way), half the transpose write traffic.
    s2d = x.astype(jnp.bfloat16).reshape(b, h2, 2, w2, 2, 3)
    s2d = jnp.transpose(s2d, (0, 2, 4, 5, 1, 3)).reshape(b, 12, h2, w2)
    # pad: 3 leading rows (2 for the conv window + 1 so each strip's
    # first conv row is the pool's top-edge row at absolute index -1),
    # 2 leading cols; lanes to a 128 multiple; rows to the strip cover
    lanes = -(-(w2 + 4) // 128) * 128
    n_strips = -(-outh // STRIP)
    rows_need = (n_strips - 1) * (2 * STRIP) + S2DR
    s2d = jnp.pad(
        s2d, ((0, 0), (0, 0), (3, rows_need - h2 - 3), (2, lanes - w2 - 2)))
    # strips overlap by S2DR - 2*STRIP rows; BlockSpec blocks cannot
    # overlap, so materialize the per-strip views (25 static slices at
    # serving geometry, ~1.25x input bytes — ~1 ms)
    strips = jnp.stack(
        [jax.lax.dynamic_slice_in_dim(s2d, j * 2 * STRIP, S2DR, axis=2)
         for j in range(n_strips)], axis=1)   # [B, S, 12, S2DR, lanes]

    w2m, bias = rearrange_stem_weights(conv_w, bn_scale, bn_shift)
    s2sel = jnp.zeros((lanes, outw), jnp.bfloat16)
    s2sel = s2sel.at[jnp.arange(outw) * 2, jnp.arange(outw)].set(1.0)

    kernel = functools.partial(_stem_kernel, lanes=lanes, w2_cols=w2)
    out = pl.pallas_call(
        kernel,
        grid=(b, n_strips),
        in_specs=[
            pl.BlockSpec((1, 1, 12, S2DR, lanes),
                         lambda i, j: (i, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 48, 64), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lanes, outw), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 64), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, STRIP, outw, 64),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (b, n_strips * STRIP, outw, 64), jnp.float32),
        interpret=interpret,
    )(strips, w2m.astype(jnp.bfloat16), s2sel,
      bias.reshape(1, 64))
    # already NHWC: rows beyond outh are the only excess
    return out[:, :outh]
