"""Training pipeline: epochs, HBM-resident data, logging, checkpoint/resume.

Reference behavior (vae.py:33-66): 7 epochs over ~50k frames, per-epoch
shuffle, batch 128 with the tail batch dropped, Adam lr 5e-5, TB scalars
every 30 batches at step ``batch_i + num_samples·ep``, save at the end.

TPU-first redesign of the data path: the reference ships every batch
host→device inside its Python loop (vae.py:47-48). Here the whole dataset is
device-put ONCE (uint8 → ~12 KB/frame) and each dispatch runs a chunk of
optimization steps under ``lax.scan`` with device-side batch gathers — the
host sends only a (K, B) int32 index array per chunk. Measured on the
tunneled v5e backend, per-batch host transfer costs ~130 ms vs ~5 ms of
compute; this driver removes it entirely.

Greenfield beyond the reference (SURVEY §5): periodic checkpoints with
optimizer state + RNG + step, crash-safe resume, JSONL metric mirror, and
data-parallel batch sharding over the device mesh.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from critic_vae_tpu.io import checkpoint as ckpt_io
from critic_vae_tpu.io.events import MetricLogger
from critic_vae_tpu.parallel.distributed import is_primary
from critic_vae_tpu.parallel.mesh import (
    DATA_AXIS,
    device_put_global,
    make_mesh,
    replicate,
)
from critic_vae_tpu.train.step import TrainState, init_train_state, make_multi_step


def train(
    critic_params,
    dataset: np.ndarray,
    *,
    epochs: int = 7,
    batch_size: int = 128,
    learning_rate: float = 5e-5,
    kld_weight: float = 1e-3,
    faithful_msssim: bool = True,
    compute_dtype: str = "float32",
    seed: int = 0,
    log_every_batches: int = 30,
    log_dir: Optional[str] = None,
    checkpoint_dir: Optional[str] = None,
    checkpoint_every_steps: int = 500,
    keep_checkpoints: int = 3,
    resume: bool = True,
    use_mesh: bool = True,
    shard_dataset="auto",
    initial_state: Optional[TrainState] = None,
    progress: bool = True,
    log_images: bool = False,
    value_consistency: float = 0.0,
    mask_distill: float = 0.0,
    pseudo_masks: Optional[np.ndarray] = None,
    film: bool = False,
) -> TrainState:
    """Train the VAE on (N, 64, 64, 3) frames — float in [0, 1] or uint8.

    ``shard_dataset``: shard the HBM-resident dataset along the mesh's data
    axis (N/D rows per device, collective-free local batch gathers —
    train/step.py::make_sharded_multi_step) so dataset capacity scales with
    chips instead of being replicated onto each (VERDICT r3 #6). "auto"
    (default) shards whenever the mesh has >1 device and N and B divide by
    it; True requires divisibility (loud error otherwise); False keeps the
    replicated layout. Sampling becomes device-stratified per epoch (each
    frame still seen exactly once; see sharded_epoch_indices).

    ``mask_distill`` / ``pseudo_masks``: opt-in self-distillation of the
    faithful mask path (round 4; pipelines/distill.py builds the
    (N, H, W) pseudo-label masks from the frozen critic's LayerCAM + CRF —
    no ground truth). The masks ride HBM-resident next to the dataset
    (uint8, same replicated/sharded layout) and the loss pushes the
    recon-diff signal into their support (train/step.py).

    Returns the final TrainState (params + BN stats + optimizer + step).
    """
    dataset = np.asarray(dataset)
    if dataset.ndim != 4:
        raise ValueError(f"dataset must be (N, H, W, C), got {dataset.shape}")
    if mask_distill > 0.0:
        if pseudo_masks is None:
            raise ValueError("mask_distill > 0 requires pseudo_masks")
        pseudo_masks = np.asarray(pseudo_masks).astype(np.uint8)
        if pseudo_masks.shape != dataset.shape[:3]:
            raise ValueError(
                f"pseudo_masks {pseudo_masks.shape} must be row-aligned with "
                f"the dataset {dataset.shape[:3]}"
            )
    if dataset.dtype != np.uint8:
        # copy=False: memory-mapped .npy datasets (pipelines/dataset.py)
        # must not be duplicated into RAM just to no-op the dtype
        dataset = dataset.astype(np.float32, copy=False)
    num_samples = len(dataset)
    steps_per_epoch = num_samples // batch_size
    if steps_per_epoch == 0:
        raise ValueError(
            f"dataset of {num_samples} frames is smaller than one batch ({batch_size})"
        )

    mesh = make_mesh() if use_mesh else None
    # Multi-host convention (SURVEY §2.3, greenfield): every process runs
    # this same function with the same dataset/seed; only the primary
    # process writes checkpoints, TB events, JSONL, and progress lines.
    # Collective compute (the train step, the probe recon) runs on ALL
    # processes — gating it on one would deadlock the others.
    primary = is_primary()
    state, tx = init_train_state(jax.random.key(seed), learning_rate, film=film)
    if initial_state is not None:
        state = initial_state

    # resolve the dataset layout over the mesh (VERDICT r3 #6)
    shard_ds = False
    if mesh is not None and mesh.devices.size > 1 and shard_dataset:
        d = int(mesh.devices.size)
        divisible = num_samples % d == 0 and batch_size % d == 0
        if divisible:
            shard_ds = True
        elif shard_dataset != "auto":
            raise ValueError(
                f"shard_dataset=True needs the dataset ({num_samples}) and "
                f"batch size ({batch_size}) divisible by the mesh size ({d})"
            )
        elif primary:
            print(
                f"dataset not shardable over {d} devices "
                f"({num_samples} % {d} or {batch_size} % {d} != 0); "
                "replicating"
            )

    start_step = 0
    if resume and checkpoint_dir:
        # every process restores (checkpoint_dir is on a shared filesystem in
        # multi-host runs — each host needs the same state to replicate)
        latest = ckpt_io.latest_checkpoint(checkpoint_dir)
        if latest is not None:
            _validate_resume_meta(
                latest[0], num_samples, batch_size, seed, film, shard_ds
            )
            state = ckpt_io.restore_train_state(latest[0], state)
            start_step = int(latest[1])
            if primary:
                print(f"resumed from {latest[0]} (step {start_step})")

    masks_dev = None
    if mesh is not None:
        state = replicate(mesh, state)
        critic_params = replicate(mesh, critic_params)
        if shard_ds:
            from jax.sharding import PartitionSpec as P

            dataset_dev = device_put_global(
                mesh, dataset, P(DATA_AXIS, None, None, None)
            )
            if mask_distill > 0.0:
                masks_dev = device_put_global(
                    mesh, pseudo_masks, P(DATA_AXIS, None, None)
                )
        else:
            dataset_dev = replicate(mesh, dataset)
            if mask_distill > 0.0:
                masks_dev = replicate(mesh, pseudo_masks)
    else:
        dataset_dev = jnp.asarray(dataset)
        if mask_distill > 0.0:
            masks_dev = jnp.asarray(pseudo_masks)

    # compute_dtype="bfloat16" runs conv/matmul math in bf16 (params, Adam
    # state, BN statistics, and the loss stay float32 — see train/step.py);
    # measured descent-equivalent on synthetic data, see docs/DESIGN.md.
    if shard_ds:
        from critic_vae_tpu.train.step import make_sharded_multi_step

        multi_step = make_sharded_multi_step(
            critic_params, tx, mesh=mesh, kld_weight=kld_weight,
            faithful_msssim=faithful_msssim,
            compute_dtype=jnp.dtype(compute_dtype),
            value_consistency=value_consistency, mask_distill=mask_distill,
        )
    else:
        multi_step = make_multi_step(
            critic_params, tx, kld_weight=kld_weight,
            faithful_msssim=faithful_msssim, mesh=mesh,
            compute_dtype=jnp.dtype(compute_dtype),
            value_consistency=value_consistency, mask_distill=mask_distill,
        )

    logger = MetricLogger(log_dir) if (log_dir and primary) else None
    shuffle_rng = np.random.default_rng(seed)

    def draw_epoch_idx() -> np.ndarray:
        if shard_ds:
            from critic_vae_tpu.train.step import sharded_epoch_indices

            return sharded_epoch_indices(
                shuffle_rng, num_samples, batch_size, int(mesh.devices.size)
            )
        order = shuffle_rng.permutation(num_samples)
        # drop the tail batch like the reference (vae.py:44-46)
        return order[: steps_per_epoch * batch_size].reshape(
            steps_per_epoch, batch_size
        ).astype(np.int32)

    start_epoch, start_row = divmod(start_step, max(steps_per_epoch, 1))
    for _ in range(start_epoch):  # keep the shuffle stream deterministic on resume
        draw_epoch_idx()

    # Dispatch granularity: one lax.scan per epoch when checkpointing is off
    # (scan compile time is trip-count-independent; per-dispatch host overhead
    # is ~100 ms through the tunneled backend — measured 53 ms/step at 30-step
    # chunks vs ~5 ms/step of compute). With checkpointing on, chunk the epoch
    # at the checkpoint cadence so a crash loses < checkpoint_every_steps
    # steps, not up to a whole epoch (at most 2 distinct trip counts compile:
    # the cadence chunk and the epoch tail).
    dispatch = steps_per_epoch
    if checkpoint_dir and 0 < checkpoint_every_steps < steps_per_epoch:
        dispatch = checkpoint_every_steps

    t0 = time.time()
    last_metrics = None
    last_ckpt_step = start_step
    try:
        for ep in range(start_epoch, epochs):
            idx_epoch = draw_epoch_idx()
            host_rows = []
            row = start_row if ep == start_epoch else 0
            while row < steps_per_epoch:
                idx_chunk = idx_epoch[row : row + dispatch]
                if mesh is not None:
                    # explicit global put: under multi-host jit cannot shard
                    # a process-local array itself — each process supplies
                    # its addressable batch columns from the (identical)
                    # global index array
                    from jax.sharding import PartitionSpec as P

                    idx_dev = device_put_global(
                        mesh, idx_chunk, P(None, DATA_AXIS)
                    )
                else:
                    idx_dev = jnp.asarray(idx_chunk)
                if mask_distill > 0.0:
                    state, metrics = multi_step(
                        state, dataset_dev, idx_dev, masks_dev
                    )
                else:
                    state, metrics = multi_step(state, dataset_dev, idx_dev)
                # one bulk device_get per dispatch — per-element device
                # indexing costs ~40 ms/scalar through a tunneled PJRT backend
                host_rows.append(jax.device_get(metrics))
                row += len(idx_chunk)
                cur_step = ep * steps_per_epoch + row
                if (
                    checkpoint_dir
                    and cur_step - last_ckpt_step >= checkpoint_every_steps
                ):
                    if primary:
                        _save_ckpt(
                            checkpoint_dir, state, keep_checkpoints,
                            meta={"num_samples": num_samples,
                                  "batch_size": batch_size, "seed": seed,
                                  "film": film, "shard_dataset": shard_ds},
                        )
                    last_ckpt_step = cur_step
            host = {
                k: np.concatenate([h[k] for h in host_rows])
                for k in host_rows[0]
            }
            last_metrics = {k: float(v[-1]) for k, v in host.items()}
            if logger:
                # reference cadence: every 30 batches at step
                # batch_i + num_samples*ep (vae.py:60-64)
                first_row = start_row if ep == start_epoch else 0
                for row in range(0, steps_per_epoch, log_every_batches):
                    if row < first_row:
                        continue
                    logger.log(
                        {k: float(v[row - first_row]) for k, v in host.items()},
                        row * batch_size + num_samples * ep,
                    )
            if log_images and log_dir:
                # run on ALL processes (the probe forward is a collective
                # program over the mesh); only the primary's logger writes
                _log_probe_images(
                    logger, state, critic_params, dataset,
                    step=num_samples * (ep + 1),
                )
            if progress and primary:
                imgs_done = num_samples * (ep + 1)
                rate = (imgs_done - start_step * batch_size) / max(
                    time.time() - t0, 1e-9
                )
                print(
                    f"    ep:{ep}, imgs:{imgs_done}, "
                    f"loss:{last_metrics['total_loss']:.4f}, "
                    f"{rate:.0f} img/s",
                    end="\r",
                )
        if progress and primary and last_metrics is not None:
            print()
    finally:
        if logger:
            logger.close()

    if checkpoint_dir and primary:
        _save_ckpt(
            checkpoint_dir, state, keep_checkpoints,
            meta={"num_samples": num_samples, "batch_size": batch_size,
                  "seed": seed, "film": film, "shard_dataset": shard_ds},
        )
    return state


@jax.jit
def _probe_recon(params, bn_state, critic_params, x):
    from critic_vae_tpu.models import vae as vae_mod
    from critic_vae_tpu.models.critic import critic_apply

    preds = critic_apply(critic_params, x)[:, 0]
    mu, _, _ = vae_mod.encode(params, bn_state, x, train=False)
    return vae_mod.decode(params, mu, preds)


def _log_probe_images(logger, state, critic_params, dataset, step: int) -> None:
    """Per-epoch visual: originals over reconstructions of a fixed probe
    batch, logged to TB's Images tab (the reference's image_summary is dead
    code — logger.py:17-28).

    Called on EVERY process in a multi-host run (the jitted probe is a
    collective program over the global mesh); ``logger`` is None off-primary
    and only the primary writes."""
    from critic_vae_tpu.parallel.mesh import fetch

    probe = dataset[:4]
    if probe.dtype == np.uint8:
        probe = probe.astype(np.float32) / 255.0
    recon = fetch(_probe_recon(state.params, state.bn_state, critic_params, probe))
    if logger is None:
        return
    strip = np.concatenate(
        [np.concatenate(list(probe), axis=1), np.concatenate(list(recon), axis=1)],
        axis=0,
    )
    logger.events.image("recon_probe", np.clip(strip, 0.0, 1.0), step=step)


def _save_ckpt(
    directory: str, state: TrainState, keep: int, meta: Optional[dict] = None
) -> None:
    from critic_vae_tpu.parallel.mesh import fetch

    os.makedirs(directory, exist_ok=True)
    host_state = fetch(state)  # multi-host safe (typed rng key included)
    step = int(host_state.step)
    path = os.path.join(directory, f"ckpt-{step}.npz")
    ckpt_io.save_train_state(path, host_state)
    if meta is not None:
        import json

        with open(_meta_path(path), "w") as f:
            json.dump(meta, f)
    ckpt_io.prune_checkpoints(directory, keep)
    if keep:  # drop meta sidecars whose checkpoint was pruned
        for name in os.listdir(directory):
            if name.endswith(".meta.json") and not os.path.exists(
                os.path.join(directory, name[: -len(".meta.json")] + ".npz")
            ):
                os.unlink(os.path.join(directory, name))


def _meta_path(ckpt_path: str) -> str:
    return ckpt_path[: -len(".npz")] + ".meta.json"


def _validate_resume_meta(
    ckpt_path: str, num_samples: int, batch_size: int, seed: int,
    film: bool = False, shard_dataset: bool = False,
) -> None:
    """Refuse to resume when the deterministic shuffle replay would misalign.

    The epoch count and shuffle stream are reconstructed from the global step
    via steps_per_epoch = num_samples // batch_size; resuming with a different
    dataset size, batch size, or seed silently re-runs or skips data. Loud
    failure is this framework's stated convention (vs the reference's silent
    random-weights fallback, vae_utility.py:353-357). The film flag is
    checked too: the checkpoint's param tree is structurally different.
    """
    import json

    mpath = _meta_path(ckpt_path)
    if not os.path.exists(mpath):  # pre-meta checkpoint: nothing to check
        return
    with open(mpath) as f:
        meta = json.load(f)
    ours = {"num_samples": num_samples, "batch_size": batch_size, "seed": seed,
            "film": film, "shard_dataset": shard_dataset}
    meta.setdefault("film", False)  # round-2 checkpoints predate the flag
    # round-3 checkpoints predate dataset sharding; its shuffle stream
    # differs (D local permutations vs 1 global), so mode flips misalign
    meta.setdefault("shard_dataset", False)
    mismatched = {k: (meta[k], ours[k]) for k in ours if meta.get(k) != ours[k]}
    if mismatched:
        raise ValueError(
            f"cannot resume from {ckpt_path}: run configuration changed "
            f"(checkpoint vs now): {mismatched}. The deterministic shuffle "
            "replay would misalign — pass resume=False (CLI: --no-resume) or "
            "restore the original dataset/batch size/seed."
        )


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
    mismatched checkpoints raise. FiLM-conditioned decoders (train --film)
    are auto-detected from the artifact's keys, so eval/video transparently
    run the stronger conditioning pathway the weights were trained with.
    """
    like_dec = dict(like_params["decoder"])
    with np.load(decoder_path) as stored:
        film_shapes = {
            k[len("params/"):]: (stored[k].shape, stored[k].dtype)
            for k in stored.files if k.startswith("params/film")
        }
    for key, (shape, dtype) in film_shapes.items():
        name, leaf = key.split("/")
        like_dec.setdefault(name, {})[leaf] = np.zeros(shape, dtype)
    enc = ckpt_io.load_pytree(
        encoder_path, {"params": like_params["encoder"], "bn_state": like_bn}
    )
    dec = ckpt_io.load_pytree(decoder_path, {"params": like_dec})
    params = {"encoder": enc["params"], "decoder": dec["params"]}
    return params, enc["bn_state"]
