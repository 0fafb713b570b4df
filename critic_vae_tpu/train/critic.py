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
