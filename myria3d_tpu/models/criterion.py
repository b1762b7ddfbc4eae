"""Loss functions over padded (B, N, C) logits with ignore-index semantics.

Replaces the reference's ``torch.nn.CrossEntropyLoss(ignore_index=65)``
(``configs/model/criterion/CrossEntropyLoss.yaml:1-3``) and its
class-weighted variant (``WeightedCrossEntropyLoss.yaml``): padded slots
carry target 65 so masking falls out of the ignore-index reduction.

Reduction matches torch: mean CE over counted targets; with class weights,
``sum(w_y * ce) / sum(w_y)`` over counted targets.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp


class CrossEntropyLoss:
    """Masked softmax cross-entropy. ``__call__(logits, targets) -> scalar``.

    Args:
        label_smoothing: torch-style smoothing epsilon.
        ignore_index: target value excluded from the loss (default 65 —
            artefact/pad code).
        weight: optional per-class weights, length num_classes.
    """

    def __init__(
        self,
        label_smoothing: float = 0.0,
        ignore_index: int = 65,
        weight: Optional[Sequence[float]] = None,
    ):
        self.label_smoothing = float(label_smoothing)
        self.ignore_index = int(ignore_index)
        self.weight = None if weight is None else jnp.asarray(weight, jnp.float32)

    def __call__(self, logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
        # logits (..., C) float, targets (...) int
        num_classes = logits.shape[-1]
        counted = (targets != self.ignore_index) & (targets >= 0) & (
            targets < num_classes
        )
        safe_t = jnp.where(counted, targets, 0)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, safe_t[..., None], axis=-1)[..., 0]
        if self.label_smoothing > 0.0:
            smooth = -jnp.mean(logp, axis=-1)
            nll = (1.0 - self.label_smoothing) * nll + self.label_smoothing * smooth
        if self.weight is not None:
            w = self.weight[safe_t] * counted.astype(jnp.float32)
        else:
            w = counted.astype(jnp.float32)
        total_w = jnp.maximum(jnp.sum(w), 1e-12)
        return jnp.sum(nll * w) / total_w
