"""Pallas TPU kernels for the match-head hot ops.

Two kernels named by the project north star (BASELINE.json):

* ``pairwise_scores`` — the street↔shop similarity matrix
  sigmoid(Σ_c v_c (x_ic − y_jc)² + c₀) tiled over [Q, G]: per tile one MXU
  matmul with the rank-1 row/col terms and the sigmoid fused in the epilogue,
  never leaving VMEM.  Replaces the reference's numpy fp16 gallery loops
  (/root/reference/evaluate_movingfashion.py:94-124).
* ``nlb_aggregate`` — the SEAM temporal attention fused end-to-end: θ/φ/g
  projections, concat-affinity (decomposed to rank-1 adds), masked
  normalization by true length, residual output projection, attention-score
  softmax pooling (/root/reference/models/nlb.py:66-101 +
  models/match_head.py:114-121) — one kernel invocation per sequence block,
  one HBM round-trip total.

Both fall back to the pure-XLA implementations off-TPU; tests run the
kernels in interpreter mode against the jnp oracles.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# --------------------------------------------------------------------------
# pairwise match scores
# --------------------------------------------------------------------------

def _pairwise_kernel(x_ref, y_ref, v_ref, c0_ref, out_ref):
    x = x_ref[:].astype(jnp.float32)            # [TQ, C]
    y = y_ref[:].astype(jnp.float32)            # [TG, C]
    v = v_ref[:].astype(jnp.float32)            # [1, C]
    a = jnp.sum(x * x * v, axis=1, keepdims=True)          # [TQ, 1]
    g = jnp.sum(y * y * v, axis=1, keepdims=True)          # [TG, 1]
    cross = jax.lax.dot_general(
        x * v, y,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                       # [TQ, TG]
    d = a + g.T - 2.0 * cross + c0_ref[0, 0]
    out_ref[:] = jax.nn.sigmoid(d)


@functools.partial(jax.jit, static_argnames=("tile_q", "tile_g", "interpret"))
def pairwise_scores(
    x: jnp.ndarray, y: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
    tile_q: int = 256, tile_g: int = 256, interpret: bool = False,
) -> jnp.ndarray:
    """x: [Q, C]; y: [G, C]; w: [2, C]; b: [2] -> [Q, G] match probability
    (identical math to ops.pairwise.pairwise_match_scores)."""
    q, c = x.shape
    g = y.shape[0]
    qp, gp = _round_up(max(q, 8), tile_q), _round_up(max(g, 8), tile_g)
    xp = jnp.pad(x.astype(jnp.float32), ((0, qp - q), (0, 0)))
    yp = jnp.pad(y.astype(jnp.float32), ((0, gp - g), (0, 0)))
    v = (w[1] - w[0]).astype(jnp.float32).reshape(1, c)
    c0 = (b[1] - b[0]).astype(jnp.float32).reshape(1, 1)

    out = pl.pallas_call(
        _pairwise_kernel,
        out_shape=jax.ShapeDtypeStruct((qp, gp), jnp.float32),
        grid=(qp // tile_q, gp // tile_g),
        in_specs=[
            pl.BlockSpec((tile_q, c), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_g, c), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile_q, tile_g), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(xp, yp, v, c0)
    return out[:q, :g]


# --------------------------------------------------------------------------
# fused NLB + attention pooling
# --------------------------------------------------------------------------

def _nlb_kernel(
    seq_ref, mask_ref,
    theta_k_ref, theta_b_ref, phi_k_ref, phi_b_ref, g_k_ref, g_b_ref,
    wcat_ref, wz_k_ref, wz_b_ref, att_k_ref, att_b_ref,
    out_ref,
):
    seq = seq_ref[0].astype(jnp.float32)          # [T, C]
    mask = mask_ref[0].astype(jnp.float32)        # [T, 1] (0/1)

    # Precision.HIGHEST: the MXU truncates f32 operands to bf16 at default
    # precision, which costs ~2e-3 relative error on the descriptors; these
    # matmuls are [T,256]-sized (negligible compute), so exactness is free
    # (verified compiled-on-TPU by tests/test_tpu_compiled.py).
    dot = lambda a, bm: jax.lax.dot_general(
        a, bm, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    theta = dot(seq, theta_k_ref[:]) + theta_b_ref[:]   # [T, C']
    phi = dot(seq, phi_k_ref[:]) + phi_b_ref[:]
    gproj = dot(seq, g_k_ref[:]) + g_b_ref[:]

    inter = theta.shape[1]
    wcat = wcat_ref[:]                                   # [2C', 1]
    a = dot(theta, wcat[:inter])                         # [T, 1]
    c = dot(phi, wcat[inter:])                           # [T, 1]
    f = jnp.maximum(a + c.T, 0.0)                        # [T, T]
    f = f * mask.T                                       # zero invalid keys
    n = jnp.maximum(jnp.sum(mask), 1.0)
    y = dot(f / n, gproj)                                # [T, C']
    z = dot(y, wz_k_ref[:]) + wz_b_ref[:] + seq          # [T, C]
    # reference skips the NLB for single-frame sequences
    multi = (jnp.sum(mask) > 1.0).astype(jnp.float32)
    z = (multi * mask) * z + (1.0 - multi * mask) * seq

    att = dot(z, att_k_ref[:]) + att_b_ref[:]            # [T, 1]
    att = jnp.where(mask > 0, att, -1e9)
    att = att - jnp.max(att)
    e = jnp.exp(att) * mask
    att = e / jnp.maximum(jnp.sum(e), 1e-20)
    out_ref[0] = jnp.sum(att * z, axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnames=("interpret",))
def nlb_aggregate(
    seqs: jnp.ndarray, mask: jnp.ndarray, params: Dict, interpret: bool = False
) -> jnp.ndarray:
    """Fused TemporalAggregator.aggregate.

    seqs: [S, T, C]; mask: [S, T]; params: the aggregator's flax param
    sub-tree ({'nlb': {theta, phi, g, w_z, concat_w}, 'attention_scorer'}).
    Returns [S, C].
    """
    s, t, c = seqs.shape
    tp = _round_up(max(t, 8), 8)
    seqs_p = jnp.pad(seqs.astype(jnp.float32), ((0, 0), (0, tp - t), (0, 0)))
    mask_p = jnp.pad(mask.astype(jnp.float32), ((0, 0), (0, tp - t)))[..., None]

    nlb = params["nlb"]
    att = params["attention_scorer"]
    args = (
        seqs_p, mask_p,
        nlb["theta"]["kernel"].astype(jnp.float32),
        nlb["theta"]["bias"].astype(jnp.float32).reshape(1, -1),
        nlb["phi"]["kernel"].astype(jnp.float32),
        nlb["phi"]["bias"].astype(jnp.float32).reshape(1, -1),
        nlb["g"]["kernel"].astype(jnp.float32),
        nlb["g"]["bias"].astype(jnp.float32).reshape(1, -1),
        nlb["concat_w"].astype(jnp.float32),
        nlb["w_z"]["kernel"].astype(jnp.float32),
        nlb["w_z"]["bias"].astype(jnp.float32).reshape(1, -1),
        att["kernel"].astype(jnp.float32),
        att["bias"].astype(jnp.float32).reshape(1, 1),
    )
    inter = c // 2
    vspec = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                       memory_space=pltpu.VMEM)
    # 3-D output so the Mosaic-blocked trailing dims are (1, c) — a 2-D
    # (1, c) block over an (S, c) array violates the sublane-divisibility
    # rule for S not multiple of the block.
    out = pl.pallas_call(
        _nlb_kernel,
        out_shape=jax.ShapeDtypeStruct((s, 1, c), jnp.float32),
        grid=(s,),
        in_specs=[
            pl.BlockSpec((1, tp, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tp, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            vspec((c, inter)), vspec((1, inter)),
            vspec((c, inter)), vspec((1, inter)),
            vspec((c, inter)), vspec((1, inter)),
            vspec((2 * inter, 1)),
            vspec((inter, c)), vspec((1, c)),
            vspec((c, 1)), vspec((1, 1)),
        ],
        out_specs=pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*args)
    return out[:, 0, :]
