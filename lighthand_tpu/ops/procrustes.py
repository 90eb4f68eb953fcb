"""Procrustes alignment / PA-MPJPE — batched jnp (vmap over samples).

Reference: ``compute_similarity_transform`` + ``reconstruction_error``
(src/utils/metric_pampjpe.py:12-99; duplicated at src/utils/loss.py:238-304
with an epsilon guard — this implementation keeps the epsilon guard and
exists exactly once).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def compute_similarity_transform(s1: jnp.ndarray, s2: jnp.ndarray) -> jnp.ndarray:
    """Optimal similarity transform (scale, rotation, translation) aligning
    point set s1 to s2 via orthogonal Procrustes (SVD).

    Args: s1, s2 of shape [N, D] (points x dims, D in {2, 3}).
    Returns s1_hat [N, D] — s1 after alignment.
    """
    # Work in [D, N] like the reference.
    x1 = s1.astype(jnp.float32).T
    x2 = s2.astype(jnp.float32).T

    mu1 = jnp.mean(x1, axis=1, keepdims=True)
    mu2 = jnp.mean(x2, axis=1, keepdims=True)
    c1 = x1 - mu1
    c2 = x2 - mu2

    var1 = jnp.sum(c1**2)
    k = c1 @ c2.T
    u, _, vh = jnp.linalg.svd(k)
    v = vh.T
    z = jnp.eye(u.shape[0], dtype=jnp.float32)
    det = jnp.sign(jnp.linalg.det(u @ v.T))
    z = z.at[-1, -1].multiply(det)
    r = v @ z @ u.T

    eps = jnp.finfo(jnp.float32).tiny
    scale = jnp.trace(r @ k) / (var1 + eps)
    t = mu2 - scale * (r @ mu1)
    return (scale * r @ x1 + t).T


def reconstruction_error(
    s1: jnp.ndarray, s2: jnp.ndarray, reduction: str = "mean"
) -> jnp.ndarray:
    """PA-MPJPE: align each sample then mean joint L2 error.

    Args: s1, s2 of shape [B, N, D].
    """
    s1_hat = jax.vmap(compute_similarity_transform)(s1, s2)
    re = jnp.mean(
        jnp.sqrt(jnp.sum((s1_hat - s2.astype(jnp.float32)) ** 2, axis=-1)), axis=-1
    )
    if reduction == "mean":
        return jnp.mean(re)
    if reduction == "sum":
        return jnp.sum(re)
    return re
