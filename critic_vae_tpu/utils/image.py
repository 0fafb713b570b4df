"""Image pre/post-processing helpers (NHWC throughout).

Covers the reference's conversion utilities (reference:
vae_utility.py:324-343, 330-335, 382-390) minus the CHW transposes — this
framework's device layout is already NHWC, so "preprocessing" is just the
[0,1] normalization and "postprocessing" just the uint8 quantization.
"""

from __future__ import annotations

import numpy as np


def adjust_values(obs) -> np.ndarray:
    """uint8 image(s) → float32 in [0, 1] (reference: adjust_values,
    vae_utility.py:324-328)."""
    return np.asarray(obs, dtype=np.float32) / 255.0


def reverse_preprocess(recon) -> np.ndarray:
    """Float reconstruction(s) → uint8 HWC for display (reference:
    reverse_preprocess, vae_utility.py:330-335 — already HWC here)."""
    with np.errstate(invalid="ignore", over="ignore"):
        return (np.asarray(recon) * 255).astype(np.uint8)


def to_np_image(x) -> np.ndarray:
    """Device array → host numpy (reference ``to_np``, vae_utility.py:382)."""
    return np.asarray(x)
