"""Gallery scoring for retrieval eval, on device.

The reference scores street queries against the shop gallery with numpy fp16
einsums that materialize a [Q, G, 256] squared-difference tensor
(/root/reference/evaluate_movingfashion.py:94-124).  Here the whole [Q, G]
match-probability matrix is computed once on the TPU via the matmul
expansion (ops.pairwise) in f32 — algebraically identical, no [Q, G, C]
intermediate, MXU-bound.  For very large galleries the shop axis can be
sharded over the mesh's 'model' axis (scores are embarrassingly parallel
along G).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.pairwise import pairwise_match_scores


@functools.partial(jax.jit, static_argnames=())
def _score_chunk(street, shop, w, b):
    if jax.default_backend() == "tpu" and street.shape[0] >= 128:
        from ..ops.pallas_kernels import pairwise_scores

        return pairwise_scores(street, shop, w, b)
    return pairwise_match_scores(street, shop, w, b)


def _bucket(n: int) -> int:
    """Round up to a shape bucket (next power of two, min 8) so repeated
    per-product calls with ragged sizes reuse compiled programs instead of
    recompiling for every distinct (Q, G)."""
    b = 8
    while b < n:
        b *= 2
    return b


def score_matrix_fp16(
    street: np.ndarray, shop: np.ndarray, w: np.ndarray, b: np.ndarray,
    chunk: int = 512,
) -> np.ndarray:
    """Bit-faithful reproduction of the reference's numpy-fp16 scoring
    chain (/root/reference/evaluate_movingfashion.py:94-121): fp16
    descriptors, fp16 squared-difference tensor, fp16 matmul + bias, fp16
    softmax.  Use for strict rank parity during the real-data gate — fp16
    rounding can flip near-tie neighbors that the f32 path orders
    differently (README parity notes).  Host-side numpy on purpose (the
    reference's rounding behavior IS numpy's); chunked over queries to
    bound the [chunk, G, 256] intermediate."""
    street16 = np.asarray(street).astype(np.float16)
    shop16 = np.asarray(shop).astype(np.float16)
    wt = np.asarray(w).transpose().astype(np.float16)
    b16 = np.asarray(b).astype(np.float16)
    outs = []
    for i in range(0, max(len(street16), 1), chunk):
        part = street16[i : i + chunk]
        if len(part) == 0:
            break
        sq = (shop16[np.newaxis] - part[:, np.newaxis]) ** 2
        raw = sq @ wt + b16
        cls = np.exp(raw) / np.exp(raw).sum(2)[:, :, np.newaxis]
        outs.append(cls[:, :, 1])
    if not outs:
        return np.zeros((0, len(shop16)), np.float32)
    return np.concatenate(outs, 0).astype(np.float32)


def score_matrix(
    street: np.ndarray, shop: np.ndarray, w: np.ndarray, b: np.ndarray,
    chunk: int = 4096, dtype: str = "f32",
) -> np.ndarray:
    """softmax((street−shop)²·Wᵀ+b)[..,1] for all pairs -> [Q, G] float32.

    Chunked over queries to bound device memory; Q/G padded to power-of-two
    buckets for compile-cache stability.  ``dtype="fp16"`` switches to the
    reference's numpy-fp16 chain (score_matrix_fp16) for strict parity.
    """
    if dtype == "fp16":
        return score_matrix_fp16(street, shop, w, b)
    street = np.asarray(street, np.float32)
    shop_np = np.asarray(shop, np.float32)
    q, g = len(street), len(shop_np)
    if q == 0:
        return np.zeros((0, g), np.float32)
    gp = _bucket(g)
    shop_j = jnp.asarray(np.pad(shop_np, ((0, gp - g), (0, 0))))
    w = jnp.asarray(w, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    outs = []
    for i in range(0, q, chunk):
        part = street[i : i + chunk]
        qp = _bucket(len(part)) if len(part) < chunk else chunk
        part = np.pad(part, ((0, qp - len(part)), (0, 0)))
        outs.append(np.asarray(_score_chunk(jnp.asarray(part), shop_j, w, b))[: min(q - i, chunk)])
    return np.concatenate(outs, axis=0)[:, :g]


def score_matrix_sharded(
    street: np.ndarray, shop: np.ndarray, w: np.ndarray, b: np.ndarray,
    mesh, axis: str = "model",
) -> np.ndarray:
    """Mesh-parallel gallery scoring: queries sharded over ``axis``; each
    device scores its query shard against the (replicated, small) gallery —
    zero collectives in the hot loop, results gathered once.  This is the
    multi-chip layout for production-size galleries (PERF.md lever 4)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    q = len(street)
    n = mesh.shape[axis]
    pad = (-q) % n
    street_p = np.pad(np.asarray(street, np.float32), ((0, pad), (0, 0)))
    xs = jax.device_put(jnp.asarray(street_p), NamedSharding(mesh, P(axis)))
    ys = jax.device_put(jnp.asarray(shop, jnp.float32), NamedSharding(mesh, P()))
    out = jax.jit(
        lambda a, bb: pairwise_match_scores(a, bb, jnp.asarray(w), jnp.asarray(b)),
        out_shardings=NamedSharding(mesh, P(axis)),
    )(xs, ys)
    return np.asarray(out)[:q]


def rank_of(scores: np.ndarray, target: int) -> np.ndarray:
    """For each query row, the rank (0-based) of ``target`` when gallery
    entries are sorted by descending score — the quantity the reference
    derives via argsort + nonzero (evaluate_movingfashion.py:99,228)."""
    order = np.argsort(scores, axis=-1)[:, ::-1]
    return np.nonzero(order == target)[1]
