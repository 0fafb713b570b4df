"""Class-balanced critic-binned frame sampling.

Reference behavior (vae_utility.py:393-462): stream trajectories in a
seed-0-shuffled order; for each frame compute the critic score and keep at
most 150 frames per trajectory from each of three bins — high (pred ≥ 0.7),
mid (0.4 ≤ pred ≤ 0.6), low (pred ≤ 0.25); frames scoring in
(0.25, 0.4) ∪ (0.6, 0.7) are dropped; a trajectory ends early once all three
bins are full; collection stops at 50,000 total frames (checked at trajectory
boundaries, so the total can overshoot like the reference's).

TPU-first redesign: the reference critic-scores **one frame at a time on the
GPU** (vae_utility.py:419); here each trajectory is scored in one batched
device call and only the (sequential, order-sensitive) bin bookkeeping runs
on host. The recon-dataset variant (``-dataset`` mode, vae_utility.py:422-443)
is a pluggable ``recon_fn`` so the same sampler drives both modes.
"""

from __future__ import annotations

from typing import Callable, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from critic_vae_tpu.models.critic import critic_apply

BinThresholds = Tuple[float, float, float, float]  # (low_max, mid_lo, mid_hi, high_min)
DEFAULT_THRESHOLDS: BinThresholds = (0.25, 0.4, 0.6, 0.7)


@jax.jit
def _score_chunk(critic_params, chunk):
    return critic_apply(critic_params, chunk)[:, 0]


def pad_to_bucket(chunk: np.ndarray, batch_size: int) -> Tuple[np.ndarray, int]:
    """Pad a ragged chunk to one of TWO bucket shapes: batch_size//4 or
    batch_size (repeat-last-frame padding). Bounds the whole run to ≤2
    compiled program shapes per consumer — real MineRL streams have ragged
    trajectory lengths (reference: vae_utility.py:393-462), and on the
    tunneled backend every fresh shape costs a 30 s–10 min compile
    (CLAUDE.md). Padding waste is ≤4× on a tiny critic/VAE forward; compile
    cost dominates it by orders of magnitude. Returns (padded, valid)."""
    valid = len(chunk)
    small = max(1, batch_size // 4)
    target = small if valid <= small else batch_size
    if valid < target:
        chunk = np.concatenate(
            [chunk, np.repeat(chunk[-1:], target - valid, axis=0)]
        )
    return chunk, valid


def score_frames(
    critic_params, frames_f32: np.ndarray, batch_size: int = 1024
) -> np.ndarray:
    """Critic scores for (N, 64, 64, 3) float frames, batched on device.

    One jitted program per bucket shape (≤2 total, :func:`pad_to_bucket`):
    eager critic_apply would dispatch ~18 individual remote ops per chunk
    (the per-dispatch overhead CLAUDE.md documents); ragged trajectory
    lengths all land on the same two compiled shapes — the round-3 version
    padded only when n > batch_size, so every short trajectory compiled a
    fresh program (VERDICT r3 #4)."""
    n = len(frames_f32)
    if n == 0:
        return np.zeros((0,), np.float32)
    preds = []
    for i in range(0, n, batch_size):
        chunk, valid = pad_to_bucket(frames_f32[i : i + batch_size], batch_size)
        preds.append(np.asarray(_score_chunk(critic_params, jnp.asarray(chunk)))[:valid])
    return np.concatenate(preds)


def select_balanced(
    preds: np.ndarray,
    collect: int = 150,
    thresholds: BinThresholds = DEFAULT_THRESHOLDS,
) -> Tuple[np.ndarray, np.ndarray]:
    """Sequential bin selection over one trajectory's scores.

    Returns (selected_indices, bins) where bins[i] ∈ {0:low, 1:mid, 2:high}.
    Matches the reference's per-frame if/elif chain and early break
    (vae_utility.py:431-457) exactly, but as a host pass over precomputed
    scores instead of a device round-trip per frame.
    """
    low_max, mid_lo, mid_hi, high_min = thresholds
    c_low = c_mid = c_high = 0
    idx: List[int] = []
    bins: List[int] = []
    for i, pred in enumerate(preds):
        if c_high >= collect and c_low >= collect and c_mid >= collect:
            break
        if mid_lo <= pred <= mid_hi and c_mid < collect:
            idx.append(i); bins.append(1); c_mid += 1
        elif pred >= high_min and c_high < collect:
            idx.append(i); bins.append(2); c_high += 1
        elif pred <= low_max and c_low < collect:
            idx.append(i); bins.append(0); c_low += 1
    return np.asarray(idx, np.int64), np.asarray(bins, np.int64)


def balanced_critic_sampler(
    trajectories: Iterable[Tuple[str, np.ndarray]],
    critic_params,
    *,
    total_images: int = 50_000,
    collect: int = 150,
    thresholds: BinThresholds = DEFAULT_THRESHOLDS,
    batch_size: int = 1024,
    recon_fn: Optional[Callable[[np.ndarray, np.ndarray], Tuple[np.ndarray, np.ndarray]]] = None,
    progress: Optional[Callable[[int], None]] = None,
) -> np.ndarray:
    """Collect a balanced training set from a stream of trajectories.

    Args:
      trajectories: iterable of (name, frames) with frames (T, 64, 64, 3)
        float32 in [0, 1] (use :func:`normalize_frames` upstream for uint8).
      critic_params: frozen critic pytree.
      recon_fn: if given, build the *reconstruction* dataset instead
        (``-dataset`` mode): called as recon_fn(frames, preds) →
        (recon_at_pred, recon_at_zero); high-bin frames contribute
        recon_at_pred, low-bin recon_at_zero, mid-bin both — matching
        vae_utility.py:431-443.

    Returns:
      (N, 64, 64, 3) float32 stacked dataset.
    """
    out: List[np.ndarray] = []
    n = 0
    for _name, frames in trajectories:
        if n >= total_images:
            break
        preds = score_frames(critic_params, frames, batch_size)
        idx, bins = select_balanced(preds, collect, thresholds)
        if len(idx) == 0:
            continue
        sel = frames[idx]
        if recon_fn is None:
            out.append(sel)
            n += len(sel)
        else:
            recon_pred, recon_zero = recon_fn(sel, preds[idx])
            take_pred = bins >= 1  # mid + high
            take_zero = bins <= 1  # low + mid
            out.append(np.asarray(recon_pred)[take_pred])
            out.append(np.asarray(recon_zero)[take_zero])
            n += int(take_pred.sum()) + int(take_zero.sum())
        if progress is not None:
            progress(n)
    if not out:
        return np.zeros((0, 64, 64, 3), np.float32)
    return np.concatenate(out, axis=0)
