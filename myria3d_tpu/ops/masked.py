"""Masked reductions and the dense neighborhood softmax.

The reference's scatter softmax over ragged neighborhoods
(``torch_geometric.utils.softmax(src, index)``, ``pyg_randla_net.py:150``)
becomes a plain masked softmax over the dense K axis of ``(B, N, K, C)``
tensors, and torch BatchNorm statistics over concatenated valid points become
masked moments over ``(B, N)`` (SURVEY.md §7 "hard parts").
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def masked_softmax(
    scores: jnp.ndarray,        # (..., K, C) or (..., K)
    valid: jnp.ndarray,         # broadcastable bool with K axis
    axis: int,
) -> jnp.ndarray:
    """Numerically-stable softmax along ``axis`` over valid entries only.

    Invalid entries get weight 0; an all-invalid segment returns all zeros
    (instead of NaN), matching scatter-softmax behavior on empty segments.
    """
    neg = jnp.finfo(scores.dtype).min
    masked_scores = jnp.where(valid, scores, neg)
    m = jnp.max(masked_scores, axis=axis, keepdims=True)
    e = jnp.exp(masked_scores - m)
    e = jnp.where(valid, e, 0.0)
    s = jnp.sum(e, axis=axis, keepdims=True)
    return e / jnp.maximum(s, 1e-16)


def masked_mean(
    x: jnp.ndarray, mask: jnp.ndarray, axis, keepdims: bool = False
) -> jnp.ndarray:
    """Mean of x over ``axis`` counting only masked-True entries."""
    m = mask.astype(x.dtype)
    num = jnp.sum(x * m, axis=axis, keepdims=keepdims)
    den = jnp.sum(m, axis=axis, keepdims=keepdims)
    return num / jnp.maximum(den, 1.0)


def masked_var(
    x: jnp.ndarray, mask: jnp.ndarray, axis, keepdims: bool = False,
    mean: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Biased variance over masked entries (torch BN uses biased batch var)."""
    if mean is None:
        mean = masked_mean(x, mask, axis, keepdims=True)
    m = mask.astype(x.dtype)
    num = jnp.sum(((x - mean) ** 2) * m, axis=axis, keepdims=keepdims)
    den = jnp.sum(m, axis=axis, keepdims=keepdims)
    return num / jnp.maximum(den, 1.0)
