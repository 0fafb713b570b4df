"""Pseudo-label mask generation for faithful-path self-distillation.

Round-4 quality loop (VERDICT r3 #3): the framework's own best mask method
— LayerCAM critic saliency + CAM-tuned CRF refinement, measured IoU
0.786–0.810 on the synthetic episodes (docs/RESULTS.md) — produces
pseudo-label masks for the TRAINING set, which the opt-in ``mask_distill``
loss term then uses to supervise the decoder's value-conditioning pathway
(train/step.py::_step_logic): the recon-difference signal the reference's
mask pipeline feeds on (reference: vae_utility.py:256-277) is pushed to
concentrate inside the critic-evidenced trunk support.

No ground truth is involved anywhere: labels derive from the frozen critic
only, so this is pure self-distillation of critic knowledge into the VAE.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

# LayerCAM pipeline measurements (docs/artifacts/saliency.json cam_sweep /
# docs/RESULTS.md): thr-IoU plateaus at t ≈ 80–110 (peak 0.523 @ 90); the
# CAM-tuned CRF 6-tuple lifts refined IoU to 0.786–0.810 across seeds.
DEFAULT_CAM_THRESHOLD = 90
CAM_TUNED_CRF_PARAMS: Tuple[float, float, float, float, float, float] = (
    132.0, 32.0, 3.1, 8.0, 1.8, 10,
)


def build_pseudo_masks(
    critic_params,
    frames: np.ndarray,
    *,
    threshold: int = DEFAULT_CAM_THRESHOLD,
    cam_block: int = 1,
    run_crf: bool = True,
    crf_params: Tuple = CAM_TUNED_CRF_PARAMS,
    crf_backend: str = "auto",
    batch_size: int = 512,
    mesh=None,
) -> np.ndarray:
    """LayerCAM + CAM-tuned-CRF pseudo-label masks for a frame set.

    Args:
      frames: (N, H, W, 3) uint8 or float32 in [0, 1].

    Returns (N, H, W) bool masks. One offline pass before training; the
    CRF refinement is the expensive half and can be disabled (run_crf=False
    → raw thresholded LayerCAM, measured IoU 0.52 vs 0.79 refined).
    """
    import jax

    from critic_vae_tpu.crf.policy import resolve_crf_backend
    from critic_vae_tpu.models.vae import init_vae_params
    from critic_vae_tpu.ops.mask import normalize_diffs_given_mean
    from critic_vae_tpu.pipelines.video import _refine, episode_device_stage

    frames = np.asarray(frames)
    if frames.dtype != np.uint8:
        frames_u8 = np.clip(frames * 255.0, 0, 255).astype(np.uint8)
    else:
        frames_u8 = frames
    # the saliency mask path never touches the VAE; placeholder params keep
    # episode_device_stage's signature (they are dead code under jit DCE)
    vae_params, bn_state = init_vae_params(jax.random.key(0))
    host, diff_chunks, valids = episode_device_stage(
        vae_params, bn_state, critic_params, frames_u8, batch_size,
        with_recons=False, fetch=False, mask_source="saliency",
        saliency_opts={"method": "layercam", "cam_block": cam_block},
        mesh=mesh,
    )
    mean_max = float(np.mean(host["max_value"]))
    masks = []
    for chunk, valid in zip(diff_chunks, valids):
        u8 = np.asarray(jax.device_get(
            normalize_diffs_given_mean(chunk, mean_max)
        ))[:valid]
        masks.append(u8 > threshold)
    thr_masks = np.concatenate(masks, axis=0)
    # Self-consistency check (no ground truth exists in real use): frames
    # the critic itself scores as trunk-positive should have non-empty CAM
    # support. The round-4 fresh-critic run failed exactly this way — the
    # critic classified fine but its LayerCAM localization collapsed
    # (pseudo-label IoU 0.006; see examples/mask_distill_experiment.py) —
    # so a high empty rate means the labels are noise and distilling from
    # them tests nothing. Warn loudly rather than guess a hard threshold.
    preds = np.asarray(host["preds"])[: len(thr_masks)]
    positive = preds > 0.5
    warn_reasons = []
    if positive.any():
        empty = ~thr_masks[positive].any(axis=(1, 2))
        empty_rate = float(empty.mean())
        if empty_rate > 0.2:
            warn_reasons.append(
                f"{empty_rate:.0%} of critic-positive frames have EMPTY "
                f"pseudo-masks")
    # round 5 (VERDICT r4 #1): the empty-mask symptom measured NOT
    # discriminating at episode scale (docs/artifacts/cam_health.json) —
    # the deletion_drop health metric is what actually separates healthy
    # from degenerate CAM (0.42 vs 0.08), so gate on it here too.
    from critic_vae_tpu.train.critic import (
        CAM_HEALTH_MIN_DELETION_DROP,
        critic_cam_health,
    )

    health = critic_cam_health(critic_params, frames_u8, cam_block=cam_block,
                               threshold=threshold)
    if health["deletion_drop"] < CAM_HEALTH_MIN_DELETION_DROP:
        warn_reasons.append(
            f"CAM deletion_drop {health['deletion_drop']:.3f} < "
            f"{CAM_HEALTH_MIN_DELETION_DROP}")
    if warn_reasons:
        import warnings

        warnings.warn(
            "build_pseudo_masks: " + "; ".join(warn_reasons) + " — the "
            "critic's LayerCAM localization looks DEGENERATE (a no-GT "
            "instance property accuracy does not reveal; docs/RESULTS.md "
            "round 5). Distilling from these labels tests nothing: "
            "retrain the critic with soft trunk-area labels "
            "(train/critic.py::soft_trunk_labels, `traincritic --labels "
            "soft`) or another seed until critic_cam_health passes.",
            stacklevel=2,
        )
    if not run_crf:
        return thr_masks
    backend = resolve_crf_backend(
        crf_backend, frames_u8.shape[1], frames_u8.shape[2]
    )
    return np.asarray(
        _refine(frames_u8, thr_masks, tuple(crf_params), backend, 0, mesh=mesh)
    ).astype(bool)
