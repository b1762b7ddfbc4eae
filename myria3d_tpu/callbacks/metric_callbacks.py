"""Per-phase segmentation metrics from a device-side confusion matrix.

Replaces the reference's torchmetrics stack (``callbacks/metric_callbacks.py:8-105``:
micro Accuracy/Precision/Recall/F1 + macro IoU + per-class variants +
ConfusionMatrix) with a single jitted masked confusion-matrix accumulator —
every metric derives from the CM on the host at epoch end, so the device work
per batch is one fused one-hot scatter instead of N metric kernels.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("num_classes",))
def confusion_matrix_update(
    cm: jnp.ndarray,        # (C, C) float32 accumulator (rows=target, cols=pred)
    logits: jnp.ndarray,    # (..., C)
    targets: jnp.ndarray,   # (...)
    mask: Optional[jnp.ndarray],  # (...) bool or None
    num_classes: int,
) -> jnp.ndarray:
    preds = jnp.argmax(logits, axis=-1).reshape(-1)
    t = targets.reshape(-1)
    valid = (t >= 0) & (t < num_classes)
    if mask is not None:
        valid = valid & mask.reshape(-1)
    idx = jnp.where(valid, t * num_classes + preds, num_classes * num_classes)
    counts = jnp.zeros(num_classes * num_classes + 1, jnp.float32).at[idx].add(1.0)
    return cm + counts[:-1].reshape(num_classes, num_classes)


def metrics_from_confusion_matrix(
    cm: np.ndarray, class_names: Optional[Dict[int, str]] = None, prefix: str = ""
) -> Dict[str, float]:
    """All reference metrics derived from one confusion matrix.

    Micro accuracy/precision/recall/F1 (identical for multiclass micro),
    macro IoU (mIoU), and per-class precision/recall/F1/IoU logged as
    ``{prefix}{metric}/{class_name}`` (reference
    ``metric_callbacks.py:60-88`` naming).
    """
    cm = np.asarray(cm, np.float64)
    num_classes = cm.shape[0]
    total = cm.sum()
    diag = np.diag(cm)
    row = cm.sum(axis=1)  # target counts
    col = cm.sum(axis=0)  # prediction counts

    def safe_div(a, b):
        return np.divide(a, b, out=np.zeros_like(a, dtype=np.float64), where=b > 0)

    precision = safe_div(diag, col)
    recall = safe_div(diag, row)
    f1 = safe_div(2 * precision * recall, precision + recall)
    union = row + col - diag
    iou = safe_div(diag, union)
    present = row > 0

    micro_acc = float(diag.sum() / total) if total > 0 else 0.0
    out: Dict[str, float] = {
        f"{prefix}acc": micro_acc,
        f"{prefix}precision": micro_acc,
        f"{prefix}recall": micro_acc,
        f"{prefix}f1": micro_acc,
        f"{prefix}iou": float(iou[present].mean()) if present.any() else 0.0,
    }
    names = class_names or {}
    for c in range(num_classes):
        name = names.get(c, str(c))
        out[f"{prefix}precision/{name}"] = float(precision[c])
        out[f"{prefix}recall/{name}"] = float(recall[c])
        out[f"{prefix}f1/{name}"] = float(f1[c])
        out[f"{prefix}iou/{name}"] = float(iou[c])
    return out


class ModelMetrics:
    """Accumulates a per-phase confusion matrix on device; computes + resets
    per epoch (reference ``ModelMetrics``, ``metric_callbacks.py:8-105``)."""

    def __init__(self, num_classes: int, classification_dict: Optional[dict] = None):
        self.num_classes = int(num_classes)
        # map consecutive class index -> human name
        names = list((classification_dict or {}).values())
        self.class_names = {i: n for i, n in enumerate(names)}
        self._cms: Dict[str, jnp.ndarray] = {}

    def update(self, phase: str, logits, targets, mask=None) -> None:
        cm = self._cms.get(phase)
        if cm is None:
            cm = jnp.zeros((self.num_classes, self.num_classes), jnp.float32)
        self._cms[phase] = confusion_matrix_update(
            cm, logits, targets, mask, self.num_classes
        )

    def confusion_matrix(self, phase: str) -> np.ndarray:
        cm = self._cms.get(phase)
        if cm is None:
            return np.zeros((self.num_classes, self.num_classes))
        return np.asarray(jax.device_get(cm))

    def compute_and_reset(self, phase: str) -> Dict[str, float]:
        cm = self.confusion_matrix(phase)
        self._cms.pop(phase, None)
        return metrics_from_confusion_matrix(
            cm, self.class_names, prefix=f"{phase}/"
        )
