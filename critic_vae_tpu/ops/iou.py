"""IoU metric over boolean masks (reference: vae_utility.py:56-68).

Pure numpy on purpose: the inputs are host mask stacks (the pipelines fetch
masks before scoring), the reference computes in numpy float64, and shipping
two (N, 64, 64) bool stacks to a tunneled device for one boolean reduction
costs seconds that np.sum does in milliseconds.
"""

from __future__ import annotations

import numpy as np


def iou(gt, pred, *, round_digits: int | None = 3) -> float:
    """Intersection-over-union of two boolean arrays of any (equal) shape.

    Matches the reference exactly: tp/(tp+fn+fp); an empty union counts as a
    perfect score (0/0 → 1.0, vae_utility.py:61-62); result rounded to three
    decimals. Called both over whole frame stacks (the headline metric,
    vae_utility.py:184,191) and per frame (bin diagnostics).
    """
    gt = np.asarray(gt, bool)
    pred = np.asarray(pred, bool)
    tp = int(np.sum(gt & pred))
    union = tp + int(np.sum(gt & ~pred)) + int(np.sum(~gt & pred))
    val = 1.0 if union == 0 else tp / union
    return round(val, round_digits) if round_digits is not None else val


def iou_batch(gt, pred) -> np.ndarray:
    """Per-frame IoU over leading axis (vectorized bin-diagnostics helper)."""
    gt = np.asarray(gt, bool).reshape(gt.shape[0], -1)
    pred = np.asarray(pred, bool).reshape(pred.shape[0], -1)
    tp = np.sum(gt & pred, axis=1)
    union = tp + np.sum(gt & ~pred, axis=1) + np.sum(~gt & pred, axis=1)
    return np.where(union == 0, 1.0, tp / np.maximum(union, 1))
