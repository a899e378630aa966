"""Pairwise match scoring: logits[i, j] = W @ (x_i - y_j)**2 + b.

The reference materializes the full [N, M, 256] squared-difference tensor
(/root/reference/models/match_head.py:73-74) and numpy fp16 copies of it in
the eval gallery math (/root/reference/evaluate_movingfashion.py:94-121).
On TPU we expand the square so the whole thing becomes three MXU matmuls and
never materializes an [N, M, C] intermediate:

  logits[i,j,k] = Σ_c W[k,c]·x[i,c]² + Σ_c W[k,c]·y[j,c]² − 2·Σ_c W[k,c]·x[i,c]·y[j,c] + b[k]
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# The expansion subtracts large near-equal terms, so the matmuls must run at
# full f32 precision — the TPU default (bf16 passes) loses ~1e-2 relative.
_P = jax.lax.Precision.HIGHEST


def pairwise_match_logits(
    x: jnp.ndarray, y: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray
) -> jnp.ndarray:
    """x: [N, C] street descriptors; y: [M, C] shop descriptors;
    w: [K, C], b: [K] (the reference's Linear(256, 2)).  Returns [N, M, K].
    """
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    w = w.astype(jnp.float32)
    xw = jnp.matmul(x * x, w.T, precision=_P)     # [N, K]
    yw = jnp.matmul(y * y, w.T, precision=_P)     # [M, K]
    cross = jnp.einsum("ic,kc,jc->ikj", x, w, y, precision=_P)  # [N, K, M]
    out = xw[:, None, :] + yw[None, :, :] - 2.0 * jnp.swapaxes(cross, 1, 2)
    return out + b


def pairwise_match_scores(
    x: jnp.ndarray, y: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray
) -> jnp.ndarray:
    """softmax(logits)[..., 1] — the match probability used for ranking
    (/root/reference/evaluate_movingfashion.py:97-98).

    Two-class softmax reduces to sigmoid(l1 − l0), and the logit difference
    is linear in (x−y)², so the whole [Q, G] score matrix is ONE matmul plus
    rank-1 terms:

      d[i,j] = Σ_c v_c (x_ic − y_jc)² + c₀,  v = w₁−w₀, c₀ = b₁−b₀
             = a_i + g_j − 2·(x∘v)·yᵀ
    """
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    v = (w[1] - w[0]).astype(jnp.float32)
    c0 = (b[1] - b[0]).astype(jnp.float32)
    # precision=_P on ALL three terms: a_i + g_j - 2*cross cancels
    # catastrophically for near-duplicate descriptors, so bf16-truncated
    # a/g would corrupt the probabilities by the ~1e-2 the module header
    # warns about (the matvecs are cheap; only the cross matmul is big)
    a = jnp.matmul(x * x, v[:, None], precision=_P)[:, 0]
    g = jnp.matmul(y * y, v[:, None], precision=_P)[:, 0]
    cross = jnp.matmul(x * v, y.T, precision=_P)
    return jax.nn.sigmoid(a[:, None] + g[None, :] - 2.0 * cross + c0)
