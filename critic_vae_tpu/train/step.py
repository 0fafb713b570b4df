"""The fused, sharded VAE train step.

The reference's training iteration is a chain of separate host-driven torch
calls — critic labels, forward, loss, backward, Adam step (reference:
vae.py:44-58), with the frozen critic re-scoring every batch on the fly
(vae.py:50). Here the *entire* iteration is one jitted function: critic
inference, encode → reparametrize → decode, MS-SSIM+KL loss, backward, and
the Adam update all compile into a single XLA executable, so weights,
activations and optimizer state never leave the device between steps.

Data parallelism: the batch argument is sharded along the mesh's ``data``
axis while params/opt state are replicated; XLA turns the implied gradient
reduction into ICI all-reduces (no hand-written collectives — SURVEY §2.3).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from critic_vae_tpu.models import critic as critic_mod
from critic_vae_tpu.models import vae as vae_mod
from critic_vae_tpu.ops.losses import vae_loss


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    """All mutable training state as one pytree (params, BN stats, Adam
    moments, RNG, step counter). The reference keeps none of this — it saves
    only final weights with no optimizer state or resume (vae.py:162-163)."""

    params: Any
    bn_state: Any
    opt_state: Any
    rng: jax.Array
    step: jax.Array


def init_train_state(
    key: jax.Array, learning_rate: float = 5e-5, film: bool = False
) -> Tuple[TrainState, optax.GradientTransformation]:
    """Fresh VAE params + Adam state (lr 5e-5, torch-default betas/eps —
    reference: vae.py:36, vae_parameters.py:11). ``film=True`` adds the
    opt-in multi-stage value-conditioning params (models/vae.py).

    Adam is wrapped in ``optax.apply_if_finite``: a batch that yields
    non-finite gradients is skipped instead of poisoning the parameters
    forever (the reference has no such guard and silently trains to NaN when
    its MS-SSIM hits a negative fractional-power — SURVEY §2.1 #7)."""
    pkey, rkey = jax.random.split(key)
    params, bn_state = vae_mod.init_vae_params(pkey, film=film)
    tx = optax.apply_if_finite(
        optax.adam(learning_rate, b1=0.9, b2=0.999, eps=1e-8),
        max_consecutive_errors=100,
    )
    opt_state = tx.init(params)
    return (
        TrainState(params, bn_state, opt_state, rkey, jnp.zeros((), jnp.int32)),
        tx,
    )


def _step_logic(
    state: TrainState,
    batch: jnp.ndarray,
    critic_params: Any,
    tx: optax.GradientTransformation,
    kld_weight: float,
    faithful_msssim: bool,
    compute_dtype,
    remat: bool = False,
    value_consistency: float = 0.0,
    mask_distill: float = 0.0,
    pseudo_masks: Optional[jnp.ndarray] = None,
):
    """One optimization step (pure; shared by the per-call and scan drivers)."""
    rng, sample_key = jax.random.split(state.rng)
    if batch.dtype == jnp.uint8:  # HBM-resident uint8 datasets normalize on device
        batch = batch.astype(compute_dtype) / jnp.asarray(255.0, compute_dtype)
    x = batch.astype(compute_dtype)
    # Frozen critic labels computed on the fly, inside the same XLA
    # program (reference recomputes them per batch too — vae.py:50).
    preds = jax.lax.stop_gradient(critic_mod.critic_apply(critic_params, x))

    # Optional rematerialization: recompute the forward activations during
    # the backward pass instead of keeping them in HBM — trades ~1.4x FLOPs
    # for peak-memory headroom at large batch sizes.
    def fwd(params, bn, key, xx, vv):
        return vae_mod.vae_apply(params, bn, key, xx, vv, train=True)

    apply_fn = jax.checkpoint(fwd) if remat else fwd

    def loss_fn(params):
        recon, mu, logvar, new_bn = apply_fn(
            params, state.bn_state, sample_key, x, preds
        )
        losses = vae_loss(
            x.astype(jnp.float32),
            mu.astype(jnp.float32),
            logvar.astype(jnp.float32),
            recon.astype(jnp.float32),
            kld_weight=kld_weight,
            faithful=faithful_msssim,
        )
        need_double = value_consistency > 0.0 or mask_distill > 0.0
        if need_double:
            pv = preds[:, 0] if preds.ndim == 2 else preds
            # the deterministic mu path is used because that is the
            # inference path masks come from (ops/mask.py::diff_images)
            recon_v = vae_mod.decode(params, mu, pv)
            recon_0 = vae_mod.decode(params, mu, jnp.zeros_like(pv))
        if value_consistency > 0.0:
            # Opt-in critic-grounded value-consistency term (round-3; the
            # round-2 ablations isolated the decoder's value-conditioning
            # pathway as the quality limiter, docs/RESULTS.md): the frozen
            # critic must read decode(mu, 0) as trunk-free and decode(mu, v)
            # as having v's trunk probability. Because the critic is the
            # discriminative map of "where a trunk is", this pushes the
            # value channel to control trunk rendering specifically —
            # strengthening the double-decode diff signal the mask pipeline
            # feeds on — rather than rewarding any arbitrary recon drift.
            # Gradients flow through the critic's FROZEN weights into the
            # decoder (and encoder via mu).
            cv = critic_mod.critic_apply(critic_params, recon_v)[:, 0]
            c0 = critic_mod.critic_apply(critic_params, recon_0)[:, 0]
            eps = 1e-6
            cv = jnp.clip(cv.astype(jnp.float32), eps, 1.0 - eps)
            c0 = jnp.clip(c0.astype(jnp.float32), eps, 1.0 - eps)
            t = jax.lax.stop_gradient(pv.astype(jnp.float32))
            bce_v = -(t * jnp.log(cv) + (1.0 - t) * jnp.log(1.0 - cv))
            bce_0 = -jnp.log(1.0 - c0)
            vc = jnp.mean(bce_v) + jnp.mean(bce_0)
            losses = dict(losses)
            losses["vc_loss"] = value_consistency * vc
            losses["total_loss"] = losses["total_loss"] + losses["vc_loss"]
        if mask_distill > 0.0:
            # Self-distillation of the faithful mask path (round 4, VERDICT
            # r3 #3): the framework's own best masks — LayerCAM saliency +
            # CAM-tuned CRF, IoU ≈ 0.8 (docs/RESULTS.md) — act as pseudo-
            # labels for the recon-difference signal itself. The diff map
            # |decode(mu,0) − decode(mu,v)| (Rec.601 grey, per-frame max-
            # normalized — EXACTLY the serving mask signal,
            # ops/mask.py::diff_images) is pushed toward the pseudo-label
            # support with a soft-Dice term: diff mass must concentrate
            # inside the mask and vanish outside. Opt-in like
            # value_consistency; labels come from the frozen critic only, so
            # this distills critic knowledge into the decoder's value
            # pathway without any ground truth.
            d = jnp.abs(recon_0.astype(jnp.float32) - recon_v.astype(jnp.float32))
            grey = (
                d[..., 0] * 0.2989 + d[..., 1] * 0.5870 + d[..., 2] * 0.1140
            )
            dn = grey / (jnp.max(grey, axis=(1, 2), keepdims=True) + 1e-6)
            m = pseudo_masks.astype(jnp.float32)
            inter = jnp.sum(dn * m, axis=(1, 2))
            dice = 1.0 - (2.0 * inter + 1e-6) / (
                jnp.sum(dn, axis=(1, 2)) + jnp.sum(m, axis=(1, 2)) + 1e-6
            )
            losses = dict(losses)
            losses["md_loss"] = mask_distill * jnp.mean(dice)
            losses["total_loss"] = losses["total_loss"] + losses["md_loss"]
        return losses["total_loss"], (losses, new_bn)

    grads, (losses, new_bn) = jax.grad(loss_fn, has_aux=True)(state.params)
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    # Mirror apply_if_finite's skip for the BatchNorm running stats: a batch
    # with non-finite gradients must not poison bn_state either (it ships in
    # the final encoder checkpoint). The RNG deliberately still advances so a
    # skipped batch does not replay identical reparam noise.
    grads_finite = jnp.all(
        jnp.asarray([jnp.all(jnp.isfinite(g)) for g in jax.tree_util.tree_leaves(grads)])
    )
    new_bn = jax.tree_util.tree_map(
        lambda n, o: jnp.where(grads_finite, n, o), new_bn, state.bn_state
    )
    return TrainState(new_params, new_bn, new_opt, rng, state.step + 1), losses


def make_train_step(
    critic_params: Any,
    tx: optax.GradientTransformation,
    *,
    kld_weight: float = 1e-3,
    faithful_msssim: bool = True,
    mesh: Optional[Mesh] = None,
    compute_dtype: jnp.dtype = jnp.float32,
    donate: bool = True,
    remat: bool = False,
    value_consistency: float = 0.0,
    mask_distill: float = 0.0,
):
    """Build the jitted train step.

    Returns ``step(state, batch) -> (state, metrics)`` where ``batch`` is
    (B, 64, 64, 3) float frames in [0, 1] and metrics are scalar
    total/recon/kld losses (reference loss structure: vae_nets.py:53-62).
    With ``mask_distill > 0`` the step takes a third operand: (B, H, W)
    pseudo-label masks for the self-distillation term (_step_logic).
    """

    if mask_distill > 0.0:
        def step(state: TrainState, batch: jnp.ndarray, masks: jnp.ndarray):
            return _step_logic(
                state, batch, critic_params, tx, kld_weight, faithful_msssim,
                compute_dtype, remat, value_consistency, mask_distill, masks,
            )
    else:
        def step(state: TrainState, batch: jnp.ndarray):
            return _step_logic(
                state, batch, critic_params, tx, kld_weight, faithful_msssim,
                compute_dtype, remat, value_consistency,
            )

    if mesh is not None:
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data", None, None, None))
        scalar = NamedSharding(mesh, P())
        in_sh = (repl, data) if mask_distill <= 0.0 else (
            repl, data, NamedSharding(mesh, P("data", None, None))
        )
        return jax.jit(
            step,
            in_shardings=in_sh,
            out_shardings=(repl, scalar),
            donate_argnums=(0,) if donate else (),
        )
    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_multi_step(
    critic_params: Any,
    tx: optax.GradientTransformation,
    *,
    kld_weight: float = 1e-3,
    faithful_msssim: bool = True,
    mesh: Optional[Mesh] = None,
    compute_dtype: jnp.dtype = jnp.float32,
    donate: bool = True,
    remat: bool = False,
    value_consistency: float = 0.0,
    mask_distill: float = 0.0,
):
    """Build the scan-based multi-step driver for HBM-resident datasets.

    The reference copies every batch host→device inside its Python batch loop
    (vae.py:47-48). On TPU (and especially through a remote-tunnel PJRT
    backend) that transfer dwarfs the math — measured ~130 ms to ship one
    128-frame batch vs ~5 ms to train on it. This driver keeps the WHOLE
    dataset device-resident (uint8: 50k frames ≈ 600 MB of HBM) and runs
    ``K`` optimization steps per dispatch under ``lax.scan``; the host only
    supplies a (K, B) int32 index array per call (a few KB).

    Returns ``multi_step(state, dataset, idx) -> (state, metrics)`` with
    ``dataset`` (N, H, W, C) uint8 or float on device, ``idx`` (K, B) int32;
    metrics are stacked per-step scalars of shape (K,). With
    ``mask_distill > 0`` a fourth operand carries the (N, H, W) pseudo-label
    masks, row-aligned with the dataset and gathered with the same indices.
    """

    distill = mask_distill > 0.0

    def multi_step(state: TrainState, dataset: jnp.ndarray, idx: jnp.ndarray,
                   masks_ds: Optional[jnp.ndarray] = None):
        def body(st, batch_idx):
            batch = jnp.take(dataset, batch_idx, axis=0)
            pm = (
                jnp.take(masks_ds, batch_idx, axis=0) if distill else None
            )
            return _step_logic(
                st, batch, critic_params, tx, kld_weight, faithful_msssim,
                compute_dtype, remat, value_consistency, mask_distill, pm,
            )

        return jax.lax.scan(body, state, idx)

    if mesh is not None:
        repl = NamedSharding(mesh, P())
        # dataset replicated; indices sharded along batch → each device
        # gathers and trains on its local batch shard.
        idx_sh = NamedSharding(mesh, P(None, "data"))
        scalar = NamedSharding(mesh, P())
        in_sh = (repl, repl, idx_sh) + ((repl,) if distill else ())
        fn = multi_step if distill else (
            lambda state, dataset, idx: multi_step(state, dataset, idx)
        )
        return jax.jit(
            fn,
            in_shardings=in_sh,
            out_shardings=(repl, scalar),
            donate_argnums=(0,) if donate else (),
        )
    return jax.jit(multi_step, donate_argnums=(0,) if donate else ())


def make_sharded_multi_step(
    critic_params: Any,
    tx: optax.GradientTransformation,
    *,
    mesh: Mesh,
    kld_weight: float = 1e-3,
    faithful_msssim: bool = True,
    compute_dtype: jnp.dtype = jnp.float32,
    donate: bool = True,
    remat: bool = False,
    value_consistency: float = 0.0,
    mask_distill: float = 0.0,
):
    """Multi-step driver over a DATA-SHARDED HBM-resident dataset.

    :func:`make_multi_step` replicates the dataset on every device, so HBM
    capacity does not scale with the mesh (VERDICT r3 #6). Here the dataset
    is sharded along the ``data`` axis — device d owns contiguous rows
    ``[d·S, (d+1)·S)`` with S = N/D — and each device gathers its batch
    shard from its OWN rows, so the gather is collective-free: it runs
    inside a ``shard_map`` whose index operand carries LOCAL row offsets
    (produced by :func:`sharded_epoch_indices`). Everything downstream
    (BatchNorm global batch statistics, the gradient all-reduce) keeps the
    jit auto-sharding semantics of the replicated driver.

    Sampling semantics: per epoch every device iterates a fresh permutation
    of its local shard, so each frame is seen exactly once per epoch and the
    tail is dropped per shard — the device-stratified counterpart of the
    reference's global shuffle (vae.py:44-46). The shard→row assignment is
    itself an arbitrary partition of the dataset, so stratification carries
    no information; a global pre-shuffle at load time de-correlates any
    source ordering.

    Returns ``sharded_multi_step(state, dataset, idx) -> (state, metrics)``
    with ``dataset`` (N, H, W, C) sharded P("data"), ``idx`` (K, B) int32 of
    LOCAL offsets laid out in device-block columns (column block
    ``[d·B/D, (d+1)·B/D)`` belongs to device d).
    """
    from jax.experimental.shard_map import shard_map

    gather_local = shard_map(
        lambda local_ds, local_idx: jnp.take(local_ds, local_idx, axis=0),
        mesh=mesh,
        in_specs=(P("data", None, None, None), P("data")),
        out_specs=P("data", None, None, None),
    )
    distill = mask_distill > 0.0
    gather_local3 = shard_map(
        lambda local_m, local_idx: jnp.take(local_m, local_idx, axis=0),
        mesh=mesh,
        in_specs=(P("data", None, None), P("data")),
        out_specs=P("data", None, None),
    )

    def sharded_multi_step(state: TrainState, dataset: jnp.ndarray,
                           idx: jnp.ndarray,
                           masks_ds: Optional[jnp.ndarray] = None):
        def body(st, batch_idx):
            batch = gather_local(dataset, batch_idx)
            pm = gather_local3(masks_ds, batch_idx) if distill else None
            return _step_logic(
                st, batch, critic_params, tx, kld_weight, faithful_msssim,
                compute_dtype, remat, value_consistency, mask_distill, pm,
            )

        return jax.lax.scan(body, state, idx)

    repl = NamedSharding(mesh, P())
    ds_sh = NamedSharding(mesh, P("data", None, None, None))
    idx_sh = NamedSharding(mesh, P(None, "data"))
    scalar = NamedSharding(mesh, P())
    in_sh = (repl, ds_sh, idx_sh) + (
        (NamedSharding(mesh, P("data", None, None)),) if distill else ()
    )
    fn = sharded_multi_step if distill else (
        lambda state, dataset, idx: sharded_multi_step(state, dataset, idx)
    )
    return jax.jit(
        fn,
        in_shardings=in_sh,
        out_shardings=(repl, scalar),
        donate_argnums=(0,) if donate else (),
    )


def sharded_epoch_indices(
    rng: "np.random.Generator", n: int, batch_size: int, n_devices: int
):
    """One epoch of LOCAL batch indices for :func:`make_sharded_multi_step`.

    With the dataset sharded in D contiguous blocks of S = N//D rows, emits
    (steps, batch_size) int32 where column block ``[d·B/D, (d+1)·B/D)``
    holds offsets into device d's local shard, each device consuming a
    fresh permutation of its rows (tail dropped per shard, mirroring the
    reference's dropped tail batch, vae.py:44-46).
    """
    import numpy as np

    if batch_size % n_devices:
        raise ValueError(
            f"batch_size {batch_size} must divide over {n_devices} devices"
        )
    if n % n_devices:
        raise ValueError(
            f"sharded dataset needs n ({n}) divisible by the mesh size "
            f"({n_devices}); pad or trim the dataset first"
        )
    s = n // n_devices
    pb = batch_size // n_devices
    steps = s // pb
    if steps == 0:
        raise ValueError(
            f"per-device shard of {s} rows is smaller than the per-device "
            f"batch ({pb})"
        )
    cols = []
    for _ in range(n_devices):
        perm = rng.permutation(s).astype(np.int32)
        cols.append(perm[: steps * pb].reshape(steps, pb))
    return np.concatenate(cols, axis=1)
