"""IoU metric over boolean masks (reference: vae_utility.py:56-68)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def iou(gt, pred, *, round_digits: int | None = 3) -> float:
    """Intersection-over-union of two boolean arrays of any (equal) shape.

    Matches the reference exactly: tp/(tp+fn+fp); an empty union counts as a
    perfect score (0/0 → 1.0, vae_utility.py:61-62); result rounded to three
    decimals. Called both over whole frame stacks (the headline metric,
    vae_utility.py:184,191) and per frame (bin diagnostics).
    """
    gt = jnp.asarray(gt, bool)
    pred = jnp.asarray(pred, bool)
    tp = jnp.sum(gt & pred)
    union = tp + jnp.sum(gt & ~pred) + jnp.sum(~gt & pred)
    val = float(jnp.where(union == 0, 1.0, tp / jnp.maximum(union, 1)))
    return round(val, round_digits) if round_digits is not None else val


def iou_batch(gt, pred) -> np.ndarray:
    """Per-frame IoU over leading axis (vectorized bin-diagnostics helper)."""
    gt = jnp.asarray(gt, bool).reshape(gt.shape[0], -1)
    pred = jnp.asarray(pred, bool).reshape(pred.shape[0], -1)
    tp = jnp.sum(gt & pred, axis=1)
    union = tp + jnp.sum(gt & ~pred, axis=1) + jnp.sum(~gt & pred, axis=1)
    return np.asarray(jnp.where(union == 0, 1.0, tp / jnp.maximum(union, 1)))
