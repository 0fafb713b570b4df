"""Training pipeline: epochs, sharded batches, logging, checkpoint/resume.

Reference behavior (vae.py:33-66): 7 epochs over ~50k frames, per-epoch
shuffle, batch 128 with the tail batch dropped, Adam lr 5e-5, TB scalars
every 30 batches at step ``batch_i + num_samples·ep``, save at the end.

Greenfield beyond the reference (SURVEY §5): periodic checkpoints with
optimizer state + RNG + step, crash-safe resume, JSONL metric mirror, and
data-parallel batch sharding over the device mesh.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import numpy as np

from critic_vae_tpu.io import checkpoint as ckpt_io
from critic_vae_tpu.io.events import MetricLogger
from critic_vae_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from critic_vae_tpu.train.step import TrainState, init_train_state, make_train_step


def train(
    critic_params,
    dataset: np.ndarray,
    *,
    epochs: int = 7,
    batch_size: int = 128,
    learning_rate: float = 5e-5,
    kld_weight: float = 1e-3,
    seed: int = 0,
    log_every_batches: int = 30,
    log_dir: Optional[str] = None,
    checkpoint_dir: Optional[str] = None,
    checkpoint_every_steps: int = 500,
    keep_checkpoints: int = 3,
    resume: bool = True,
    use_mesh: bool = True,
    initial_state: Optional[TrainState] = None,
    progress: bool = True,
) -> TrainState:
    """Train the VAE on (N, 64, 64, 3) float frames in [0, 1].

    Returns the final TrainState (params + BN stats + optimizer + step).
    """
    dataset = np.asarray(dataset, np.float32)
    if dataset.ndim != 4:
        raise ValueError(f"dataset must be (N, H, W, C), got {dataset.shape}")
    num_samples = len(dataset)

    mesh = make_mesh() if use_mesh else None
    state, tx = init_train_state(jax.random.key(seed), learning_rate)
    if initial_state is not None:
        state = initial_state

    start_epoch = 0
    if resume and checkpoint_dir:
        latest = ckpt_io.latest_checkpoint(checkpoint_dir)
        if latest is not None:
            state = ckpt_io.restore_train_state(latest[0], state)
            steps_per_epoch = num_samples // batch_size
            start_epoch = int(state.step) // max(steps_per_epoch, 1)
            print(f"resumed from {latest[0]} (step {latest[1]})")

    if mesh is not None:
        state = replicate(mesh, state)
        critic_params = replicate(mesh, critic_params)
    step_fn = make_train_step(
        critic_params, tx, kld_weight=kld_weight, mesh=mesh
    )

    logger = MetricLogger(log_dir) if log_dir else None
    shuffle_rng = np.random.default_rng(seed)
    # fast-forward the shuffle stream for resumed epochs (determinism)
    for _ in range(start_epoch):
        shuffle_rng.permutation(num_samples)

    t0 = time.time()
    metrics = None
    try:
        for ep in range(start_epoch, epochs):
            order = shuffle_rng.permutation(num_samples)
            # drop the tail batch like the reference (vae.py:44-46)
            for bi, start in enumerate(range(0, num_samples - batch_size + 1, batch_size)):
                batch = dataset[order[start : start + batch_size]]
                batch = shard_batch(mesh, batch) if mesh is not None else jax.numpy.asarray(batch)
                state, metrics = step_fn(state, batch)

                if bi % log_every_batches == 0:
                    # reference log step: batch_i + num_samples*ep (vae.py:64)
                    log_step = start + num_samples * ep
                    if logger:
                        logger.log(
                            {k: float(v) for k, v in metrics.items()}, log_step
                        )
                    if progress:
                        imgs_done = num_samples * ep + start + batch_size
                        rate = imgs_done / max(time.time() - t0, 1e-9)
                        print(
                            f"    ep:{ep}, imgs:{imgs_done}, "
                            f"loss:{float(metrics['total_loss']):.4f}, "
                            f"{rate:.0f} img/s",
                            end="\r",
                        )
                if (
                    checkpoint_dir
                    and int(state.step) % checkpoint_every_steps == 0
                ):
                    _save_ckpt(checkpoint_dir, state, keep_checkpoints)
        if progress and metrics is not None:
            print()
    finally:
        if logger:
            logger.close()

    if checkpoint_dir:
        _save_ckpt(checkpoint_dir, state, keep_checkpoints)
    return state


def _save_ckpt(directory: str, state: TrainState, keep: int) -> None:
    os.makedirs(directory, exist_ok=True)
    step = int(jax.device_get(state.step))
    ckpt_io.save_train_state(os.path.join(directory, f"ckpt-{step}.npz"), jax.device_get(state))
    ckpt_io.prune_checkpoints(directory, keep)


def save_final_weights(state: TrainState, encoder_path: str, decoder_path: str) -> None:
    """Save encoder and decoder separately, mirroring the reference's final
    artifact layout (vae.py:162-163). BN running stats ride with the encoder."""
    params = jax.device_get(state.params)
    bn = jax.device_get(state.bn_state)
    ckpt_io.save_pytree(encoder_path, {"params": params["encoder"], "bn_state": bn})
    ckpt_io.save_pytree(decoder_path, {"params": params["decoder"]})


def load_final_weights(encoder_path: str, decoder_path: str, like_params, like_bn):
    """Load the separate encoder/decoder artifacts back into full pytrees.

    Unlike the reference's loader, which swallows errors and silently
    continues with random weights (vae_utility.py:353-357), missing or
    mismatched checkpoints raise.
    """
    enc = ckpt_io.load_pytree(
        encoder_path, {"params": like_params["encoder"], "bn_state": like_bn}
    )
    dec = ckpt_io.load_pytree(decoder_path, {"params": like_params["decoder"]})
    params = {"encoder": enc["params"], "decoder": dec["params"]}
    return params, enc["bn_state"]
