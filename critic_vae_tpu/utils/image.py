"""Image pre/post-processing helpers (NHWC throughout).

Covers the reference's conversion utilities (reference:
vae_utility.py:324-343, 330-335, 382-390) minus the CHW transposes — this
framework's device layout is already NHWC, so "preprocessing" is just the
[0,1] normalization and "postprocessing" just the uint8 quantization.

These are thin names over the canonical implementations (the API-parity
surface for SURVEY §2.1 #10); the behavior lives in data/episode.py and
viz/panels.py so the two call sites cannot drift.
"""

from __future__ import annotations

import numpy as np


def adjust_values(obs) -> np.ndarray:
    """uint8 image(s) → float32 in [0, 1] (reference: adjust_values,
    vae_utility.py:324-328)."""
    from critic_vae_tpu.data.episode import normalize_frames

    return normalize_frames(np.asarray(obs))


def reverse_preprocess(recon) -> np.ndarray:
    """Float reconstruction(s) → uint8 HWC for display (reference:
    reverse_preprocess, vae_utility.py:330-335 — already HWC here)."""
    from critic_vae_tpu.viz.panels import to_uint8_rgb

    return to_uint8_rgb(recon)


def to_np_image(x) -> np.ndarray:
    """Device array → host numpy (reference ``to_np``, vae_utility.py:382)."""
    return np.asarray(x)
