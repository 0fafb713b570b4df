"""Recon-difference mask pipeline, fully batched and jit-fused.

Reference behavior (vae_utility.py:256-277, 148-160, vae.py:98-108): per
frame, decode the same latent twice — once at the critic's predicted value,
once at zero — take the per-pixel |difference| of the two reconstructions,
convert to Rec.601 greyscale, and record the per-frame max. Then a *global*
two-pass normalization: every diff map is clamped at the mean of the
per-frame maxima and scaled by its reciprocal, quantized to uint8, and
thresholded (> t) into a binary tree-trunk mask.

TPU-first redesign (the reference runs all of this frame-by-frame at batch
size 1, recomputing reconstructions 13× for the threshold sweep,
vae.py:121-123):

* encode once per frame; BOTH decodes run as a single decoder call on a
  doubled batch (2B), so the conv weights stream from HBM once;
* diff → greyscale → per-frame max fuse into the same XLA program;
* the two-pass normalization is a scalar reduction on device;
* the threshold sweep vectorizes over all 13 thresholds at once against the
  *same* uint8 diff maps — recons are computed exactly once.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from critic_vae_tpu.models import critic as critic_mod
from critic_vae_tpu.models import vae as vae_mod

# Rec.601 luma weights (reference: vae_utility.py:273)
REC601 = (0.2989, 0.5870, 0.1140)


def diff_images(
    vae_params, bn_state, x: jnp.ndarray, values: jnp.ndarray,
    *, use_pallas: bool | None = None, fused_pool=False,
    fold_bn: bool = False, pool_impl: str = "reduce_window",
    block0_f32: bool = False, downstream_dtype=None, start_block: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched double-decode diff (reference: get_diff_image, vae_utility.py:256-277).

    Args:
      x: (B, 64, 64, 3) normalized frames.
      values: (B,) critic values to inject for the "one" reconstruction.
      use_pallas: run the tanh+diff+greyscale+max tail as the hand-written
        Pallas kernel (ops/pallas_kernels.py) instead of the XLA formulation.
        Default False: measured on v5e, the standalone kernel is ~10% slower
        end-to-end because it forces the pre-tanh activations to materialize
        at a kernel boundary, while XLA fuses this elementwise tail straight
        into the decoder's conv epilogue (bf16 pipeline: 145k fps XLA vs
        126k fps Pallas). Kept as a validated alternative and a template for
        tails XLA cannot fuse.

    Returns:
      recon_one: decode(mu, value) — (B, 64, 64, 3)
      recon_zero: decode(mu, 0)
      diff: (B, 64, 64) unnormalized greyscale |recon_zero − recon_one|
      max_value: (B,) per-frame diff maxima

    The recon outputs are lazily derived (tanh of the pre-activations); on
    the mask-only path XLA dead-code-eliminates them entirely.
    """
    mu, _, _ = vae_mod.encode(
        vae_params, bn_state, x, train=False, fused_pool=fused_pool,
        fold_bn=fold_bn, pool_impl=pool_impl, block0_f32=block0_f32,
        downstream_dtype=downstream_dtype, start_block=start_block,
    )
    b = mu.shape[0]
    pre = vae_mod.decode(
        vae_params,
        jnp.concatenate([mu, mu], axis=0),
        jnp.concatenate([values.reshape(b), jnp.zeros((b,), values.dtype)]),
        apply_tanh=False,
    )
    pre_one, pre_zero = pre[:b], pre[b:]
    recon_one, recon_zero = jnp.tanh(pre_one), jnp.tanh(pre_zero)
    if use_pallas is None:
        use_pallas = False
    if use_pallas:
        from critic_vae_tpu.ops.pallas_kernels import fused_diff_mask

        grey, maxv = fused_diff_mask(pre_one, pre_zero)
        return recon_one, recon_zero, grey, maxv
    diff = jnp.abs(recon_zero.astype(jnp.float32) - recon_one.astype(jnp.float32))
    grey = (
        diff[..., 0] * REC601[0] + diff[..., 1] * REC601[1] + diff[..., 2] * REC601[2]
    )
    return recon_one, recon_zero, grey, jnp.max(grey, axis=(1, 2))


def normalize_diffs(
    diffs: jnp.ndarray, max_values: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Two-pass mean-max normalization → uint8 diff maps.

    Matches prepare_diff + get_diff_factor (vae_utility.py:106-110, 279-284):
    clamp at mean(max_values), scale by 1/mean (0 if the mean is 0), then
    quantize with the reference's truncating ``(d*255).astype(uint8)``.

    Returns (diff_u8 (B, H, W) uint8, mean_max scalar).
    """
    mean_max = jnp.mean(max_values)
    return normalize_diffs_given_mean(diffs, mean_max), mean_max


def normalize_diffs_given_mean(diffs: jnp.ndarray, mean_max) -> jnp.ndarray:
    """The elementwise half of :func:`normalize_diffs`, with the global
    mean-max supplied — lets chunked pipelines normalize each device-resident
    chunk in place after one tiny max-values fetch, instead of round-tripping
    the full diff stack through the host. Bit-identical to normalize_diffs
    on the same mean."""
    factor = jnp.where(mean_max != 0, 1.0 / jnp.where(mean_max == 0, 1.0, mean_max), 0.0)
    clamped = jnp.minimum(diffs, mean_max) * factor
    return (clamped * 255.0).astype(jnp.uint8)


def quantize_recons(recon: jnp.ndarray) -> jnp.ndarray:
    """Float reconstruction → uint8 on device, matching the reference's
    truncating host cast ``(x*255).astype(np.uint8)`` exactly
    (vae_utility.py:387: truncation toward zero, modulo-256 wrap for
    negatives, non-finite → 0). Panels consume uint8 anyway, so quantizing
    inside the jitted program cuts the recon fetch 4× — the dominant
    device→host cost for panel-producing runs on tunneled/remote backends."""
    scaled = recon.astype(jnp.float32) * 255.0
    scaled = jnp.where(jnp.isfinite(scaled), scaled, 0.0)
    return jnp.mod(jnp.trunc(scaled), 256.0).astype(jnp.uint8)


def threshold_masks(diff_u8: jnp.ndarray, thresholds: jnp.ndarray) -> jnp.ndarray:
    """Binary masks for every threshold at once.

    diff_u8 (B, H, W) uint8 × thresholds (T,) → (T, B, H, W) bool.
    The reference recomputes the whole pipeline per threshold
    (vae.py:121-123); here the sweep is one broadcast compare. The compare
    runs in int32 so out-of-range thresholds keep the reference's semantics
    (t > 255 → all False) instead of silently wrapping modulo 256; the cast
    fuses into the compare, so the HBM read stays uint8.
    """
    return diff_u8[None].astype(jnp.int32) > thresholds[:, None, None, None].astype(
        jnp.int32
    )


def pack_mask_bits(masks: jnp.ndarray) -> jnp.ndarray:
    """Pack boolean masks to 1 bit/pixel along the last axis (device op).

    (..., W) bool → (..., W//8) uint8, MSB-first within each byte —
    ``np.unpackbits(packed, axis=-1)`` is the exact host inverse
    (:func:`unpack_mask_bits`). Boolean mask fetches through this mount's
    ~13 MB/s device→host tunnel are a top cost of the CRF-enabled video
    pipeline (VERDICT r4 #2); packing cuts their bytes 8× for a few cheap
    VPU ops. Requires W % 8 == 0 (every supported episode resolution —
    callers fall back to plain fetches otherwise).
    """
    if masks.shape[-1] % 8:
        raise ValueError(
            f"pack_mask_bits: last axis {masks.shape[-1]} not a multiple of 8"
        )
    b = masks.reshape(*masks.shape[:-1], masks.shape[-1] // 8, 8)
    weights = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.uint8)
    # per-byte sum of ≤8 one-hot-weighted bits — cannot exceed 255, so the
    # uint8 accumulation is exact
    return (b.astype(jnp.uint8) * weights).sum(-1).astype(jnp.uint8)


def unpack_mask_bits(packed: np.ndarray) -> np.ndarray:
    """Host inverse of :func:`pack_mask_bits`: (..., W//8) uint8 → (..., W)
    bool via numpy's MSB-first unpackbits."""
    return np.unpackbits(np.asarray(packed), axis=-1).astype(bool)


def iou_stacked(gt: jnp.ndarray, masks: jnp.ndarray) -> jnp.ndarray:
    """Whole-stack IoU per threshold: gt (B,H,W) bool × masks (T,B,H,W) →
    (T,) float (0/0 → 1.0, reference semantics vae_utility.py:56-68)."""
    gt = gt[None].astype(bool)
    masks = masks.astype(bool)
    tp = jnp.sum(gt & masks, axis=(1, 2, 3))
    union = tp + jnp.sum(gt & ~masks, axis=(1, 2, 3)) + jnp.sum(~gt & masks, axis=(1, 2, 3))
    return jnp.where(union == 0, 1.0, tp / jnp.maximum(union, 1))


@functools.partial(
    jax.jit,
    static_argnames=(
        "with_recons", "compute_dtype", "recons_u8", "mask_source",
        "saliency_logits", "saliency_samples", "saliency_noise",
        "saliency_sigma", "saliency_method", "saliency_cam_block",
        "saliency_cam_upsample", "saliency_tta_flip", "saliency_tta_shift",
        "fused_pool", "fold_bn", "pool_impl",
        "block0_f32", "front_end",
    ),
)
def episode_forward(
    vae_params,
    bn_state,
    critic_params,
    frames: jnp.ndarray,
    *,
    with_recons: bool = True,
    compute_dtype: str = "float32",
    recons_u8: bool = False,
    mask_source: str = "diff",
    saliency_logits: bool = False,
    saliency_samples: int = 1,
    saliency_noise: float = 0.0,
    saliency_sigma: float = None,
    saliency_seed=None,
    saliency_method: str = "gradient",
    saliency_cam_block: int = 1,
    saliency_cam_upsample: str = "lanczos3",
    saliency_tta_flip: bool = False,
    saliency_tta_shift: int = 0,
    fused_pool: bool = False,
    fold_bn: bool = False,
    pool_impl: str = "reduce_window",
    block0_f32: bool = False,
    front_end: str = "auto",
):
    """Fused per-frame stage of the video pipeline: critic score + double
    decode + diff/greyscale/max, one XLA program over the whole frame batch
    (reference loops frames at batch 1: vae_utility.py:171-181).

    Args:
      with_recons: also return the two reconstructions (needed for panel
        composition). ``False`` lets XLA fuse the decoder epilogue straight
        into the diff reduction and skip materializing both (2B, 64, 64, 3)
        recon tensors in HBM — the mask/IoU path needs only the diff maps.
      compute_dtype: "float32" (parity default) or "bfloat16" (halves HBM
        traffic on this memory-bound pipeline).
      fused_pool: route the critic's and encoder's conv+pool blocks through
        the phase-packed stride-2 formulation (ops/poolconv.py) — exact up
        to GEMM-order reassociation; measured NEGATIVE on the real chip
        (round-4 probes), kept as a validated opt-in. The shipping serving
        optimization is the merged front-end via ``front_end="auto"``
        (bench.py uses that default).
      mask_source: "diff" (faithful default — VAE recon difference,
        vae_utility.py:171-184) or "saliency" (critic input-gradient maps,
        ops/saliency.py — measured ~2.4× the diff method's IoU on the
        synthetic benchmark; ~4× with the SmoothGrad-logit options below).
        The saliency map rides the SAME downstream
        normalization/threshold/CRF machinery via the ``diff``/``max_value``
        keys; recons are still produced when ``with_recons`` for panels.
      saliency_logits / saliency_samples / saliency_noise / saliency_sigma /
      saliency_method / saliency_cam_block / saliency_tta_flip:
        forwarded to ops/saliency.py::critic_saliency (logit-space gradients
        + SmoothGrad averaging + smoothing σ; ``None`` σ = the per-method
        default; method "gradient" or "layercam" + its tap block). Only
        consulted for the saliency source.
      front_end: "auto" (default) | "split" | "merged". "merged" computes
        the critic's 3×3 first conv (zero-padded to 5×5) and the encoder's
        5×5 first conv as ONE 3→40-channel conv so the pathological
        3-channel input (round-4 per-block profile: the two first convs =
        ~3.2 ms of the 7.0 ms pipeline) is read once — bit-identical
        outputs, +1.5% pipeline throughput. "auto" resolves to merged on
        the plain diff path and split otherwise (saliency / block0_f32 /
        fused_pool / fold_bn each need the split first conv).
      saliency_seed: TRACED scalar (numpy uint32, required when
        ``saliency_noise > 0``) from which the noise key is built inside the jitted
        program. A host scalar rather than a key array for the same reason
        as the pipeline's ``mean_max``: under multi-host jit a process-local
        committed array cannot mix with global-mesh operands, but host
        numpy can (pipelines/video.py:222-224).

    Returns dict(preds (B,), diff (B,H,W) f32, max_value (B,) [, recon_one,
    recon_zero]).

    ``frames`` may be uint8: normalization then happens on device (u8 →
    f32/255 → compute dtype — XLA lowers the division to a
    multiply-by-reciprocal, so results match the host-normalized path within
    ≤1 ulp of input noise) and the host→device transfer shrinks 4× — the
    dominant cost when frames stream over PCIe/tunnel rather than living in
    HBM.
    """
    if mask_source not in ("diff", "saliency"):
        raise ValueError(
            f"unknown mask_source {mask_source!r} (diff|saliency)"
        )
    if front_end == "auto":
        # merged is bit-identical to split (on-chip probe: pred_max_abs 0.0,
        # mask_agree 1.0) and +1.5% throughput (7.01 → 6.91 ms at B=1024
        # bf16), so it is the diff-path default; saliency has no split
        # first conv to merge. block0_f32 does NOT compose (merged f32 conv
        # measured 7.03 ms — slower than either alone), so auto keeps split
        # there.
        front_end = (
            "merged" if (mask_source == "diff" and not block0_f32
                         and not fused_pool and not fold_bn)
            else "split"
        )
    if front_end == "merged" and mask_source != "diff":
        raise ValueError(
            "front_end='merged' fuses the critic/encoder first convs on the "
            "diff mask path; the saliency source differentiates through the "
            "whole critic and has no split first conv to merge"
        )
    if block0_f32 and mask_source != "diff":
        raise ValueError(
            "block0_f32 applies to the diff path's first conv blocks; the "
            "saliency stage already runs in float32 end-to-end "
            "(ops/saliency.py) — combining them would only silently run "
            "the with_recons VAE decode in f32 instead of compute_dtype"
        )
    if frames.dtype == jnp.uint8:
        frames = frames.astype(jnp.float32) / 255.0
    # block0_f32: the first conv blocks consume the f32 frames DIRECTLY
    # (no bf16 input copy — a materialized cast copy cancels the f32-conv
    # win, round-4 probe) and cast to compute_dtype at block-0 output.
    cdt = jnp.dtype(compute_dtype)
    x = frames.astype(jnp.float32) if block0_f32 else frames.astype(cdt)
    if mask_source == "saliency":
        from critic_vae_tpu.ops.saliency import critic_saliency

        # saliency inputs/accumulation stay f32 (frames, not the bf16
        # compute_dtype x): the map is a derivative of an 11k-param net,
        # cheap either way. MXU matmul operands still round to bf16 at
        # default precision — every measured saliency IoU/throughput
        # number includes that (the smoothing convs alone run at HIGHEST
        # for scipy parity, ops/saliency.py)
        sal_key = None
        if saliency_noise > 0.0:
            if saliency_seed is None:
                raise ValueError(
                    "episode_forward: saliency SmoothGrad sampling needs "
                    "saliency_seed"
                )
            sal_key = jax.random.key(saliency_seed)
        sigma_kw = (
            {} if saliency_sigma is None
            else {"smooth_sigma": saliency_sigma}
        )
        preds, sal = critic_saliency(
            critic_params, frames,
            logits=saliency_logits, samples=saliency_samples,
            noise=saliency_noise, key=sal_key, method=saliency_method,
            cam_block=saliency_cam_block,
            cam_upsample=saliency_cam_upsample,
            tta_flip=saliency_tta_flip, tta_shift=saliency_tta_shift,
            **sigma_kw,
        )
        if with_recons:
            recon_one, recon_zero, _, _ = diff_images(
                vae_params, bn_state, x, preds.astype(x.dtype)
            )
        diff = sal
        max_value = sal.max(axis=(1, 2))
    else:
        # fused_pool=True resolves to each model's measured-best serving
        # config: "s2d" first-block for the critic (its whole cost), the
        # FUSED_POOL_SERVING tuple for the encoder (models/*.py round-4
        # notes)
        if front_end == "merged":
            # Merged front-end (round 4): the critic's 3×3 first conv
            # (zero-padded to 5×5) and the encoder's 5×5 first conv share
            # ONE 3→40-channel conv over the frames — the 3-channel input
            # is read once and the two separately-pathological first convs
            # (round-4 per-block profile) become one (measured 1.49 → 1.22
            # ms for the conv pair). Exact: the padded critic kernel
            # computes identical taps; each branch applies its own
            # bias/BN/pool/activation in the reference order
            # (critic_net.py:15-29 conv→ReLU→pool; vae_nets.py:68-88
            # conv→BN→pool→ReLU).
            enc0 = vae_params["encoder"]["conv0"]
            conv_dt = jnp.float32 if block0_f32 else cdt
            ne = enc0["w"].shape[-1]  # encoder block-0 channels (32)
            kh = enc0["w"].shape[0] - critic_params["conv0_w"].shape[0]
            w_cr = jnp.pad(
                critic_params["conv0_w"],
                ((kh // 2, kh - kh // 2), (kh // 2, kh - kh // 2),
                 (0, 0), (0, 0)),
            )
            wm = jnp.concatenate(
                [enc0["w"].astype(conv_dt), w_cr.astype(conv_dt)], axis=-1
            )
            y = jax.lax.conv_general_dilated(
                x.astype(conv_dt), wm, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            # bias in conv_dt BEFORE the cast — matches the split paths'
            # conv-epilogue bias exactly (bit-identical with block0_f32 too)
            ye = (y[..., :ne] + enc0["b"].astype(conv_dt)).astype(cdt)
            ye, _ = vae_mod._batchnorm(
                ye, vae_params["encoder"]["bn0"], bn_state["bn0"], False
            )
            h_enc = jax.nn.relu(vae_mod._maxpool2(ye))
            yc = jax.nn.relu(
                (y[..., ne:] + critic_params["conv0_b"].astype(conv_dt))
                .astype(cdt)
            )
            h_cr = vae_mod._maxpool2(yc)
            preds = critic_mod.critic_apply(
                critic_params, h_cr, start_block=1
            )[:, 0]
            recon_one, recon_zero, diff, max_value = diff_images(
                vae_params, bn_state, h_enc, preds.astype(cdt), start_block=1,
            )
        else:
            if front_end != "split":
                raise ValueError(
                    f"unknown front_end {front_end!r} (split|merged)"
                )
            critic_fp = "s2d" if fused_pool is True else fused_pool
            ddt = cdt if block0_f32 else None
            preds = critic_mod.critic_apply(
                critic_params, x, fused_pool=critic_fp, block0_f32=block0_f32,
                downstream_dtype=ddt,
            )[:, 0]
            recon_one, recon_zero, diff, max_value = diff_images(
                vae_params, bn_state, x, preds.astype(cdt),
                fused_pool=fused_pool, fold_bn=fold_bn, pool_impl=pool_impl,
                block0_f32=block0_f32, downstream_dtype=ddt,
            )
    out = {
        "preds": preds.astype(jnp.float32),
        "diff": diff.astype(jnp.float32),
        "max_value": max_value.astype(jnp.float32),
    }
    if with_recons:
        if recons_u8:
            out["recon_one"] = quantize_recons(recon_one)
            out["recon_zero"] = quantize_recons(recon_zero)
        else:
            out["recon_one"] = recon_one.astype(jnp.float32)
            out["recon_zero"] = recon_zero.astype(jnp.float32)
    return out
