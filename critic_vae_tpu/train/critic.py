"""Critic training (framework-native capability).

The reference only CONSUMES pretrained critic checkpoints produced by a
separate codebase (reference: vae_parameters.py:38, "copied from
critic-code" vae_utility.py:21); the checkpoints' filenames record the
training recipe (cepochs=15, dropout=0.3, datamode=trunk). This module lets
the framework produce its own critics — binary tree-trunk classifiers
trained with BCE on frame-level labels — so the full Critic-VAE stack can be
built from raw episodes without any external artifact.

Same TPU pattern as the VAE trainer: one fused jitted step (dropout fwd +
BCE + Adam), batches gathered on device from an HBM-resident dataset under
``lax.scan``.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from critic_vae_tpu.models.critic import critic_apply, init_critic_params


def labels_from_masks(gt: np.ndarray, min_pixels: int = 1) -> np.ndarray:
    """Frame-level trunk-visibility labels from per-pixel GT masks."""
    return (gt.reshape(len(gt), -1).sum(axis=1) >= min_pixels).astype(np.float32)


def make_critic_multi_step(
    tx: optax.GradientTransformation,
    *,
    dropout_rate: float = 0.3,
    donate: bool = True,
):
    """Scan driver: ``step(carry, dataset, labels, idx) -> (carry, losses)``.

    carry = (params, opt_state, rng); dataset (N, 64, 64, 3) uint8/float on
    device; idx (K, B) int32.
    """

    def one_step(carry, batch, y):
        params, opt_state, rng = carry
        rng, drop_key = jax.random.split(rng)
        if batch.dtype == jnp.uint8:
            batch = batch.astype(jnp.float32) / 255.0

        def loss_fn(p):
            logits = critic_apply(
                p, batch, train=True, dropout_rate=dropout_rate,
                rng=drop_key, return_logits=True,
            )[:, 0]
            return jnp.mean(optax.sigmoid_binary_cross_entropy(logits, y))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state, rng), loss

    def multi_step(carry, dataset, labels, idx):
        def body(c, bi):
            return one_step(c, jnp.take(dataset, bi, axis=0), jnp.take(labels, bi))

        return jax.lax.scan(body, carry, idx)

    return jax.jit(multi_step, donate_argnums=(0,) if donate else ())


def train_critic(
    frames: np.ndarray,
    labels: np.ndarray,
    *,
    epochs: int = 15,  # matches the bundled checkpoints' cepochs=15
    batch_size: int = 128,
    learning_rate: float = 1e-3,
    dropout_rate: float = 0.3,  # matches the bundled checkpoints' recipe
    seed: int = 0,
    progress: Optional[bool] = True,
) -> Tuple[dict, float]:
    """Train a critic from scratch on labeled frames.

    Args:
      frames: (N, 64, 64, 3) uint8 or float in [0, 1].
      labels: (N,) float 0/1 trunk-visibility labels.

    Returns:
      (params, final_loss).
    """
    frames = np.asarray(frames)
    if frames.dtype != np.uint8:
        frames = frames.astype(np.float32)
    labels = np.asarray(labels, np.float32)
    n = len(frames)
    steps_per_epoch = n // batch_size
    if steps_per_epoch == 0:
        raise ValueError(f"{n} frames < one batch ({batch_size})")

    params = init_critic_params(jax.random.key(seed))
    tx, multi_step = _cached_multi_step(float(learning_rate), float(dropout_rate))
    carry = (params, tx.init(params), jax.random.key(seed + 1))

    dataset_dev = jnp.asarray(frames)
    labels_dev = jnp.asarray(labels)
    shuffle = np.random.default_rng(seed)
    loss = float("nan")
    for ep in range(epochs):
        order = shuffle.permutation(n)[: steps_per_epoch * batch_size]
        idx = jnp.asarray(order.reshape(steps_per_epoch, batch_size).astype(np.int32))
        carry, losses = multi_step(carry, dataset_dev, labels_dev, idx)
        loss = float(jax.device_get(losses)[-1])
        if progress:
            print(f"    critic ep:{ep} loss:{loss:.4f}", end="\r")
    if progress:
        print()
    return jax.device_get(carry[0]), loss


@functools.lru_cache(maxsize=8)
def _cached_multi_step(learning_rate: float, dropout_rate: float):
    """One jitted scan driver per (lr, dropout): repeated train_critic calls
    (e.g. the ablation sweep) reuse the traced program instead of building a
    fresh closure — and a fresh trace/compile — every invocation."""
    tx = optax.adam(learning_rate)
    return tx, make_critic_multi_step(tx, dropout_rate=dropout_rate)


def critic_accuracy(params, frames: np.ndarray, labels: np.ndarray,
                    batch_size: int = 1024) -> float:
    """Eval-mode binary accuracy at threshold 0.5."""
    from critic_vae_tpu.data.sampler import score_frames

    f = frames.astype(np.float32) / 255.0 if frames.dtype == np.uint8 else frames
    preds = score_frames(params, f, batch_size)
    return float(((preds > 0.5) == (np.asarray(labels) > 0.5)).mean())


def soft_trunk_labels(gt: np.ndarray, percentile: float = 90.0) -> np.ndarray:
    """Soft trunk-AREA labels: per-frame trunk pixel count, clipped at the
    ``percentile``-th positive-frame area and scaled to [0, 1].

    The round-5 CAM-robustness finding (docs/RESULTS.md,
    docs/artifacts/cam_recipe.json): a BINARY-label critic can reach 1.000
    holdout accuracy with degenerate LayerCAM — classification saturates on
    the single most discriminative (or merely co-occurring) feature, so the
    logit's activation gradients need not cover the object. An area target
    makes the logit scale with trunk EXTENT, forcing spatially-distributed
    evidence; it is what separates the CAM-validated bundled critic
    (0.52 block-1 CAM IoU at 0.888 binary accuracy) from the degenerate
    fresh ones (≈0.12 at 1.000). Same supervision source as
    :func:`labels_from_masks` — anywhere binary labels exist, these do too.
    """
    counts = np.asarray(gt).reshape(len(gt), -1).sum(axis=1).astype(np.float32)
    pos = counts[counts > 0]
    scale = float(np.percentile(pos, percentile)) if len(pos) else 1.0
    return np.clip(counts / max(scale, 1.0), 0.0, 1.0)


def critic_cam_health(
    params,
    frames: np.ndarray,
    *,
    cam_block: int = 1,
    threshold: int = 90,
    batch_size: int = 256,
    max_frames: int = 512,
) -> dict:
    """NO-ground-truth LayerCAM health metrics for a trained critic.

    CAM quality is critic-INSTANCE-dependent in a way accuracy does not
    reveal (the round-4 finding, docs/RESULTS.md "mask self-distillation"),
    so every consumer of the LayerCAM mask chain — ``traincritic``, the
    pseudo-label builder, the `--quality` preset — needs a label-free gate.
    Metrics (measured discrimination in docs/artifacts/cam_health.json —
    healthy bundled critic vs a degenerate 1.000-accuracy fresh one):

    * ``deletion_drop`` — mean prediction drop on critic-positive frames
      when the thresholded-CAM support is erased with the frame's mean
      color. A faithful CAM covers the evidence, so deleting it guts the
      prediction: bundled 0.42 vs degenerate 0.08. THE discriminating
      metric; gate at :data:`CAM_HEALTH_MIN_DELETION_DROP`.
    * ``cam_top5_mass`` — mean fraction of CAM mass in the top-5% pixels
      (degenerate maps are spikier: 0.63 vs 0.38). Secondary signal.
    * ``empty_rate`` / ``positive_fraction`` — the round-4 warning's
      symptom; measured NOT discriminating at episode scale (0.0 both) but
      kept: an all-empty CAM is still conclusive.

    Returns a dict of python floats; pure eval (no RNG, no training).
    """
    import jax
    import jax.numpy as jnp

    from critic_vae_tpu.models.critic import critic_apply
    from critic_vae_tpu.ops.mask import normalize_diffs_given_mean
    from critic_vae_tpu.ops.saliency import critic_saliency

    frames = np.asarray(frames)[:max_frames]
    f32 = frames.astype(np.float32) / 255.0 if frames.dtype == np.uint8 \
        else frames.astype(np.float32)

    preds_l, maps_l = [], []
    for i in range(0, len(f32), batch_size):
        p, m = critic_saliency(
            params, jnp.asarray(f32[i : i + batch_size]),
            method="layercam", cam_block=cam_block)
        preds_l.append(np.asarray(p))
        maps_l.append(np.asarray(m))
    preds = np.concatenate(preds_l)
    maps = np.concatenate(maps_l)

    mean_max = float(np.mean(maps.max(axis=(1, 2))))
    if mean_max == 0.0:
        u8 = np.zeros(maps.shape, np.uint8)
    else:
        u8 = np.asarray(normalize_diffs_given_mean(
            jnp.asarray(maps), np.float32(mean_max)))
    masks = u8 > threshold
    pos = preds > 0.5

    out = {"positive_fraction": float(pos.mean()),
           "n_frames": int(len(frames))}
    if not pos.any():
        out.update(empty_rate=1.0, deletion_drop=0.0, cam_top5_mass=1.0)
        return out
    out["empty_rate"] = float((~masks[pos].any(axis=(1, 2))).mean())

    fill = f32.mean(axis=(1, 2), keepdims=True)
    erased = np.where(masks[..., None], fill, f32)
    p_del_l = []
    for i in range(0, len(erased), batch_size):
        p_del_l.append(np.asarray(critic_apply(
            params, jnp.asarray(erased[i : i + batch_size])))[:, 0])
    p_del = np.concatenate(p_del_l)
    out["deletion_drop"] = float((preds[pos] - p_del[pos]).mean())

    flat = maps.reshape(len(maps), -1)
    k = max(1, flat.shape[1] // 20)
    top = np.partition(flat, -k, axis=1)[:, -k:].sum(axis=1)
    tot = np.maximum(flat.sum(axis=1), 1e-9)
    out["cam_top5_mass"] = float((top[pos] / tot[pos]).mean())
    return out


# Gate for critic_cam_health's deletion_drop: measured healthy ≈ 0.42,
# degenerate ≈ 0.08 (docs/artifacts/cam_health.json); 0.25 splits the gap
# with margin on both sides.
CAM_HEALTH_MIN_DELETION_DROP = 0.25

# Strict gate for CAM-GRADE critics (round 5, docs/artifacts/
# cam_health_target.json): across 64 soft-label instances, BOTH candidates
# with deletion_drop above ~0.65 reached — and beat — the bundled critic's
# TTA mask chain (thr/CRF IoU 0.61/0.90 and 0.64/0.96 vs 0.58/0.84) on all
# three episode seeds, while none of the 62 below it passed the 0.05
# acceptance bar (drop→thr-IoU Spearman 0.80). Qualifying instances occur
# at ~3% per training run, so this is a RETRY gate
# (``train_critic_selected(health_target=...)``, `traincritic
# --cam-health-target`), not a pool-argmax criterion — expect a geometric
# number of candidates (measured runs: 3, 9, >40).
CAM_HEALTH_TARGET_STRICT = 0.65


def train_critic_selected(
    frames: np.ndarray,
    labels: np.ndarray,
    *,
    candidates: int = 4,
    base_seed: int = 0,
    health_frames: Optional[np.ndarray] = None,
    health_target: Optional[float] = None,
    progress: Optional[bool] = True,
    **train_kw,
) -> Tuple[dict, dict, list]:
    """Train up to ``candidates`` critics (seeds ``base_seed..``) and keep
    the best by NO-ground-truth CAM health (``deletion_drop``,
    :func:`critic_cam_health`).

    Why selection: CAM quality varies strongly across otherwise-identical
    training runs even with the CAM-robust soft-label recipe — measured
    block-1 CAM IoU {0.31, 0.34, 0.56} across three soft-label seeds, and
    ``deletion_drop`` tracks it monotonically ({0.31, 0.34, 0.68};
    docs/artifacts/cam_recipe.json) — so picking the argmax-health instance
    converts instance luck into a reliable recipe without ever touching
    pixel ground truth. Validated end-to-end in
    docs/artifacts/cam_select_validation.json (best-of-6 pools) and
    docs/artifacts/cam_health_target.json (the target mode below).

    ``health_target`` switches from fixed-pool argmax to a RETRY recipe:
    candidates train in seed order and the first whose ``deletion_drop``
    reaches the target is selected immediately (no further training); if
    none of the ``candidates`` seeds reaches it, the argmax instance is
    returned with ``health_target_met=False`` so callers can warn or keep
    retrying with a later ``base_seed``. Rationale: across 18 instances the
    drop→chain-IoU relation supports thresholding rather than pool-argmax
    (a pool's best can still be a weak-CAM instance — the round-5
    1-of-3-pools residual; docs/artifacts/cam_health_target.json).

    Returns ``(best_params, best_health, per_seed_reports)``.
    """
    if candidates < 1:
        raise ValueError(f"candidates must be >= 1, got {candidates}")
    hf = frames if health_frames is None else health_frames
    best = None
    reports = []
    for c in range(candidates):
        seed = base_seed + c
        params, loss = train_critic(
            frames, labels, seed=seed, progress=progress, **train_kw)
        health = critic_cam_health(params, hf)
        reports.append({"seed": seed, "final_loss": float(loss), **health})
        if progress:
            print(f"    candidate seed {seed}: deletion_drop="
                  f"{health['deletion_drop']:.3f}")
        if best is None or health["deletion_drop"] > best[1]["deletion_drop"]:
            best = (params, health, seed)
        if (health_target is not None
                and health["deletion_drop"] >= health_target):
            best = (params, health, seed)
            break
    out_health = {**best[1], "selected_seed": best[2]}
    if health_target is not None:
        out_health["health_target_met"] = (
            best[1]["deletion_drop"] >= health_target)
    return best[0], out_health, reports
