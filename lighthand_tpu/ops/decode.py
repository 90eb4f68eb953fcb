"""Heatmap -> keypoint decoding, on-device.

Replaces reference ``get_max_preds`` (src/utils/loss.py:327-355), which runs
as NumPy on the host *every training step* (method.py:172-178 — a D2H sync
per step). Here decoding is a jnp argmax that stays on the TPU and fuses into
the eval step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def get_max_preds(batch_heatmaps: jnp.ndarray):
    """Argmax decode.

    Args:
      batch_heatmaps: [B, J, H, W].
    Returns:
      preds: [B, J, 2] (x, y) float32 in heatmap coordinates, zeroed where
        the max value is <= 0 (matches loss.py:351-354).
      maxvals: [B, J, 1].
    """
    b, j, h, w = batch_heatmaps.shape
    flat = batch_heatmaps.reshape(b, j, h * w)
    idx = jnp.argmax(flat, axis=2)
    maxvals = jnp.max(flat, axis=2)

    x = (idx % w).astype(jnp.float32)
    y = jnp.floor(idx.astype(jnp.float32) / w)
    preds = jnp.stack([x, y], axis=-1)

    mask = (maxvals > 0.0).astype(jnp.float32)[..., None]
    preds = preds * mask
    return preds, maxvals[..., None]


def soft_argmax_preds(batch_heatmaps: jnp.ndarray, temperature: float = 1.0):
    """Differentiable sub-pixel decode (framework extension; the reference
    only supports hard argmax). Softmax-weighted expectation over the grid.

    Returns preds [B, J, 2] (x, y) float32 and confidences [B, J, 1].
    """
    b, j, h, w = batch_heatmaps.shape
    flat = batch_heatmaps.reshape(b, j, h * w).astype(jnp.float32)
    probs = jax.nn.softmax(flat * temperature, axis=-1)

    xs = jnp.arange(w, dtype=jnp.float32)
    ys = jnp.arange(h, dtype=jnp.float32)
    grid = probs.reshape(b, j, h, w)
    ex = jnp.einsum("bjhw,w->bj", grid, xs)
    ey = jnp.einsum("bjhw,h->bj", grid, ys)
    conf = jnp.max(flat, axis=-1, keepdims=True)
    return jnp.stack([ex, ey], axis=-1), conf
