"""Video / mask-evaluation pipeline.

Capability parity with the reference's ``-video [-thresh]`` mode
(reference: vae.py:113-129, vae_utility.py:162-212): per frame — critic
score, reconstruction at the predicted value vs at zero, |diff| greyscale
mask, global mean-max normalization, binary threshold, dense-CRF refinement,
IoU against ground truth, annotated 7-panel frames, a bin-diagnostics file,
and a looping GIF.

TPU-first redesign of the hot path (the reference walks 550 frames one at a
time at batch 1, and its ``-thresh`` sweep recomputes every reconstruction
13×, vae.py:121-123):

* the whole episode runs through one fused jitted program in large padded
  chunks — critic + encode + double-decode + diff + per-frame max never
  leave the device;
* reconstructions are computed exactly once; the threshold sweep is a
  vectorized uint8 compare over all thresholds simultaneously;
* CRF refinement (host C++, OpenMP over frames) and PIL composition are the
  only host stages.
"""

from __future__ import annotations

import dataclasses
from collections import defaultdict
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from critic_vae_tpu.crf import REFERENCE_CRF_PARAMS as DEFAULT_CRF_PARAMS
from critic_vae_tpu.ops.iou import iou, iou_batch
from critic_vae_tpu.parallel.mesh import fetch as _fetch
from critic_vae_tpu.ops.mask import (
    episode_forward,
    normalize_diffs_given_mean,
    threshold_masks,
)


@jax.jit
def _normalize_threshold_chunk(diff, mean_max, thresholds):
    """Per-chunk device pass: mean-max normalize to uint8 + threshold
    compare ((T, B, H, W) for all thresholds at once), without the diff
    stack ever visiting the host."""
    u8 = normalize_diffs_given_mean(diff, mean_max)
    return u8, threshold_masks(u8, thresholds)


@jax.jit
def _sweep_chunk_stats(masks, gt):
    """Per-chunk (tp, fn, fp) counts per threshold, on device — the sweep's
    whole-stack IoUs then need no mask re-upload. Per-chunk int32 counts
    cannot overflow (≤512·4096 pixels per chunk); the caller accumulates in
    int64 and divides with ops/iou.py semantics (f64, 0/0 → 1)."""
    gt_b = gt[None].astype(bool)
    m = masks.astype(bool)
    tp = jnp.sum(gt_b & m, axis=(1, 2, 3))
    fn = jnp.sum(gt_b & ~m, axis=(1, 2, 3))
    fp = jnp.sum(~gt_b & m, axis=(1, 2, 3))
    return tp, fn, fp


def _refine(frames_u8, thr_masks, crf_params, backend: str, num_threads: int,
            mesh=None):
    """Dispatch CRF refinement to the host C++ lattice or the on-device
    exact mean-field (``crf/device.py``). ``device`` computes the exact
    Gaussian model the lattice approximates and keeps the whole video
    pipeline on the accelerator (sharded over ``mesh`` when given)."""
    if backend == "device":
        from critic_vae_tpu.crf.device import refine_masks_device

        return refine_masks_device(frames_u8, thr_masks, crf_params, mesh=mesh)
    if backend != "host":
        raise ValueError(f"unknown crf backend {backend!r} (host|device)")
    from critic_vae_tpu.crf import refine_masks

    return refine_masks(frames_u8, thr_masks, crf_params, num_threads)


@dataclasses.dataclass
class EpisodeResult:
    preds: np.ndarray  # (N,)
    recon_one: Optional[np.ndarray]  # (N, H, W, 3) float/u8; None w/o recons
    recon_zero: Optional[np.ndarray]
    diff_u8: np.ndarray  # (N, H, W) uint8 normalized diff maps
    thr_masks: np.ndarray  # (N, H, W) bool
    crf_masks: Optional[np.ndarray]  # (N, H, W) bool or None
    thr_iou: float
    crf_iou: Optional[float]


def episode_device_stage(
    vae_params, bn_state, critic_params, frames_f32: np.ndarray,
    batch_size: int = 512, *, with_recons: bool = True,
    compute_dtype: str = "float32", mesh=None, recons_u8: bool = False,
    fetch: bool = True, mask_source: str = "diff",
    saliency_opts: Optional[Dict] = None, prefetch: int = 1,
):
    """Run the fused per-frame stage over the episode in padded chunks.

    Chunks are padded to a fixed batch so jit compiles exactly once
    (SURVEY §7: static shapes). With a ``mesh``, each chunk is sharded along
    the data axis and the same jitted program scales over every chip — the
    north star's streaming-video layout (frames sharded, params replicated,
    no collectives needed since the per-frame stage is embarrassingly data
    parallel).

    ``frames_f32`` may also be uint8: chunks then ship to the device raw
    (4× less host→device traffic — the dominant cost for streamed episodes)
    and normalize on device with identical results (see episode_forward).

    ``recons_u8`` quantizes the reconstructions to uint8 inside the jitted
    program (reference cast semantics, ops/mask.py::quantize_recons) — 4×
    less device→host traffic for panel-producing runs.

    ``saliency_opts`` (only read for ``mask_source="saliency"``) is a dict
    with any of ``logits`` (bool), ``samples`` (int), ``noise`` (float),
    ``seed`` (int), ``sigma`` (float smoothing σ; None = per-method
    default), ``method`` ("gradient" | "layercam"), ``cam_block`` (int),
    ``cam_upsample`` (interpolation kernel) —
    the options of ops/saliency.py::critic_saliency. When sampling is on, each chunk gets
    its own noise stream via ``seed + chunk_index`` (distinct threefry
    seeds are independent streams), passed as a traced host scalar so the
    jitted program compiles once and stays multi-host-safe.

    Returns host arrays ``{key: (N, ...)}`` by default. With
    ``fetch=False`` returns ``(host, diff_chunks, valids)``: everything
    except the diff maps is still fetched and freed chunk by chunk
    (bounding HBM residency — the reconstructions are by far the largest
    tensors), but ``diff_chunks`` stays as per-chunk DEVICE arrays (still
    padded; N·H·W·4 bytes total) so the caller's global mean-max
    normalization pass can run on device without round-tripping the diff
    stack through the host. ``valids`` holds per-chunk valid frame counts.

    ``prefetch`` chunks are dispatched AHEAD of the oldest chunk's blocking
    fetch (round 5, VERDICT r4 #2): jax dispatch is async, so chunk k+1's
    upload + device compute overlap chunk k's device→host fetch — the
    round-3 e2e measurement was fetch-bound at 346 f/s precisely because
    this loop serialized dispatch→fetch (this mount's tunnel fetches at
    ~13 MB/s, docs/DESIGN.md). HBM residency stays bounded at
    ``prefetch + 1`` chunks' outputs. ``prefetch=0`` restores the serial
    round-3/4 behavior (results are bit-identical either way — the
    equivalence is pinned in tests/test_video_pipeline.py).
    """
    from collections import deque

    from critic_vae_tpu.parallel.mesh import replicate, shard_batch
    sal = dict(logits=False, samples=1, noise=0.0, seed=0, sigma=None,
               method="gradient", cam_block=1, cam_upsample="lanczos3",
               tta_flip=False, tta_shift=0)
    if saliency_opts:
        unknown = set(saliency_opts) - set(sal)
        if unknown:
            raise ValueError(f"unknown saliency_opts keys: {sorted(unknown)}")
        sal.update(saliency_opts)
    # noise == 0 is the deterministic path no matter the sample count
    # (ops/saliency.py short-circuits it) — no seed, no RNG in the program
    sal_sampling = mask_source == "saliency" and sal["noise"] > 0.0

    if mesh is not None:
        vae_params = replicate(mesh, vae_params)
        bn_state = replicate(mesh, bn_state)
        critic_params = replicate(mesh, critic_params)
        batch_size = max(batch_size, mesh.devices.size)
        batch_size += (-batch_size) % mesh.devices.size

    n = len(frames_f32)
    host_keys = ("preds", "max_value") + (
        ("recon_one", "recon_zero") if with_recons else ()
    )
    outs: Dict[str, List] = {k: [] for k in host_keys}
    diff_chunks: List = []
    valids: List[int] = []

    def _dispatch(i: int):
        chunk = frames_f32[i : i + batch_size]
        valid = len(chunk)
        if valid < batch_size:
            pad = np.repeat(chunk[-1:], batch_size - valid, axis=0)
            chunk = np.concatenate([chunk, pad], axis=0)
        dev_chunk = (
            shard_batch(mesh, chunk) if mesh is not None else jnp.asarray(chunk)
        )
        res = episode_forward(
            vae_params, bn_state, critic_params, dev_chunk,
            with_recons=with_recons, compute_dtype=compute_dtype,
            recons_u8=recons_u8, mask_source=mask_source,
            saliency_logits=sal["logits"], saliency_samples=sal["samples"],
            saliency_noise=sal["noise"], saliency_sigma=sal["sigma"],
            saliency_method=sal["method"], saliency_cam_block=sal["cam_block"],
            saliency_cam_upsample=sal["cam_upsample"],
            saliency_tta_flip=sal["tta_flip"],
            saliency_tta_shift=sal["tta_shift"],
            saliency_seed=(
                np.uint32(sal["seed"] + i // batch_size) if sal_sampling
                else None
            ),
        )
        return res, valid

    def _drain_one(pending):
        res, valid = pending.popleft()
        valids.append(valid)
        host = _fetch({k: res[k] for k in host_keys})
        for k in host_keys:
            outs[k].append(host[k][:valid])
        if fetch:
            diff_chunks.append(_fetch(res["diff"])[:valid])
        else:
            diff_chunks.append(res["diff"])

    pending: deque = deque()
    for i in range(0, n, batch_size):
        pending.append(_dispatch(i))
        if len(pending) > max(int(prefetch), 0):
            _drain_one(pending)
    while pending:
        _drain_one(pending)
    host_out = {k: np.concatenate(v, axis=0) for k, v in outs.items()}
    if fetch:
        host_out["diff"] = np.concatenate(diff_chunks, axis=0)
        return host_out
    return host_out, diff_chunks, valids


def eval_episode(
    vae_params,
    bn_state,
    critic_params,
    frames_u8: np.ndarray,
    gt: Optional[np.ndarray],
    *,
    threshold: int = 50,
    crf_params: Tuple = DEFAULT_CRF_PARAMS,
    run_crf: bool = True,
    batch_size: int = 512,
    num_threads: int = 0,
    compute_dtype: str = "float32",
    mesh=None,
    crf_backend: str = "auto",
    recons_u8: bool = False,
    with_recons: bool = True,
    mask_source: str = "diff",
    saliency_opts: Optional[Dict] = None,
) -> EpisodeResult:
    """Full mask pipeline over an episode (reference: eval_textured_frames).

    The whole stage stays on device: chunks run the fused forward, the
    global mean-max comes back as one tiny per-chunk fetch, and each
    device-resident diff chunk is normalized + thresholded in place — the
    only bulk device→host traffic is the uint8 diff maps, the boolean
    masks, and (optionally uint8-quantized) reconstructions.

    Args:
      frames_u8: (N, H, W, 3) uint8 raw frames (the CRF consumes these raw,
        matching vae_utility.py:186).
      gt: (N, H, W) bool ground truth, or None to skip IoU/CRF scoring.
      mesh: optional device mesh — each chunk is sharded along the data axis
        (params replicated), the north-star streaming-serving layout. Results
        are identical to single-device (SURVEY §2.3).
      recons_u8: quantize reconstructions to uint8 on device (reference cast
        semantics) — panels consume uint8 anyway; 4× less fetch.
      mask_source: "diff" (faithful default) or "saliency" — critic
        input-gradient maps (ops/saliency.py) through the same
        normalize/threshold/CRF machinery; ``diff_u8`` then holds the
        normalized saliency map.
      saliency_opts: SmoothGrad-logit options (see episode_device_stage);
        the measured best {"logits": True, "samples": 8, "noise": 0.08}
        reaches ~4.6× the recon-diff IoU on the synthetic benchmark
        (docs/artifacts/saliency.json).
    """
    if run_crf:
        from critic_vae_tpu.crf.policy import resolve_crf_backend

        crf_backend = resolve_crf_backend(
            crf_backend, frames_u8.shape[1], frames_u8.shape[2]
        )
    host, diff_chunks, valids = episode_device_stage(
        vae_params, bn_state, critic_params, frames_u8, batch_size,
        compute_dtype=compute_dtype, mesh=mesh, recons_u8=recons_u8,
        with_recons=with_recons, fetch=False, mask_source=mask_source,
        saliency_opts=saliency_opts,
    )

    # Global two-pass normalization (vae_utility.py:106-110): the mean is
    # computed on device over the same trimmed f32 sequence as the
    # unchunked path; only uint8 diffs and boolean masks come to the host.
    # device-computed mean, then back to a HOST scalar: jitted chunk calls
    # below take it as numpy so multi-host jit never sees a process-local
    # committed array mixed with global-mesh operands
    mean_max = np.asarray(jnp.mean(jnp.asarray(host["max_value"])))

    # Round-5 overlap (VERDICT r4 #2): the normalize/threshold programs for
    # EVERY chunk are dispatched up front (their outputs are ~2 B/pixel —
    # HBM residency is not a concern the way the device stage's recons are),
    # the device-CRF mean-field is dispatched BEFORE any bulk fetch, and the
    # host-CRF runs per chunk on a consumer thread as its masks arrive
    # (ctypes releases the GIL, so the C++ lattice genuinely overlaps the
    # next chunk's tunnel fetch). Device compute, device→host transfers and
    # host CRF all overlap; results are bit-identical to the serial order.
    t_arr = np.asarray([threshold], np.int32)
    norm_chunks = [
        _normalize_threshold_chunk(diff_chunks[ci], mean_max, t_arr)
        for ci in range(len(valids))
    ]

    crf_dev = None
    host_pool = futures = None
    if run_crf and crf_backend == "device" and jax.process_count() == 1:
        from critic_vae_tpu.crf.device import refine_masks_device

        dev_masks = jnp.concatenate(
            [thr_c[0][:valid] for (_, thr_c), valid in zip(norm_chunks, valids)]
        )
        crf_dev = refine_masks_device(
            frames_u8, dev_masks, crf_params, mesh=mesh, fetch=False
        )
    elif run_crf and crf_backend == "host":
        import concurrent.futures

        host_pool = concurrent.futures.ThreadPoolExecutor(max_workers=1)
        futures = []

    # Boolean masks fetch as PACKED BITS (ops/mask.py::pack_mask_bits) —
    # 8× fewer bytes through the ~13 MB/s tunnel for a few VPU ops; numpy
    # unpackbits is the exact inverse. Falls back to plain bool fetches at
    # widths not divisible by 8 (no supported episode resolution).
    from critic_vae_tpu.ops.mask import pack_mask_bits, unpack_mask_bits

    packable = frames_u8.shape[2] % 8 == 0
    offsets = np.concatenate([[0], np.cumsum(valids)[:-1]])
    diff_parts, thr_parts = [], []
    try:
        for ci, valid in enumerate(valids):
            u8, thr_c = norm_chunks[ci]
            want = {"u8": u8, "thr": (
                pack_mask_bits(thr_c[0]) if packable else thr_c[0]
            )}
            fetched = _fetch(want)
            diff_parts.append(fetched["u8"][:valid])
            thr = fetched["thr"][:valid]
            if packable:
                thr = unpack_mask_bits(thr)
            thr_parts.append(thr)
            if host_pool is not None:
                off = int(offsets[ci])
                futures.append(host_pool.submit(
                    _refine, frames_u8[off : off + valid], thr, crf_params,
                    "host", num_threads,
                ))
        diff_u8 = np.concatenate(diff_parts)
        thr_masks = np.concatenate(thr_parts)

        thr_iou_val = iou(gt, thr_masks) if gt is not None else None

        crf_masks = crf_iou_val = None
        if run_crf:
            if crf_dev is not None:
                if packable:
                    crf_masks = unpack_mask_bits(
                        jax.device_get(pack_mask_bits(crf_dev))
                    )
                else:
                    crf_masks = np.asarray(jax.device_get(crf_dev))
            elif host_pool is not None:
                crf_masks = np.concatenate([f.result() for f in futures])
            else:  # device backend under multi-host: collective-safe path
                crf_masks = _refine(frames_u8, thr_masks, crf_params,
                                    crf_backend, num_threads, mesh=mesh)
            if gt is not None:
                crf_iou_val = iou(gt, crf_masks)
    finally:
        if host_pool is not None:
            host_pool.shutdown(wait=True)

    return EpisodeResult(
        preds=host["preds"],
        recon_one=host.get("recon_one"),
        recon_zero=host.get("recon_zero"),
        diff_u8=diff_u8,
        thr_masks=thr_masks,
        crf_masks=crf_masks,
        thr_iou=thr_iou_val,
        crf_iou=crf_iou_val,
    )


def threshold_sweep(
    vae_params,
    bn_state,
    critic_params,
    frames_u8: np.ndarray,
    gt: np.ndarray,
    thresholds: Sequence[int] = tuple(range(0, 130, 10)),
    *,
    crf_params: Tuple = DEFAULT_CRF_PARAMS,
    run_crf: bool = True,
    batch_size: int = 512,
    num_threads: int = 0,
    compute_dtype: str = "float32",
    mesh=None,
    crf_backend: str = "auto",
    mask_source: str = "diff",
    saliency_opts: Optional[Dict] = None,
) -> List[Dict]:
    """Threshold sweep with reconstructions computed once.

    The reference re-runs the entire pipeline (recons included) per
    threshold (vae.py:121-123); here the device stage runs once and all
    threshold masks + IoUs come from one vectorized pass. CRF still runs per
    threshold (its input mask differs). ``mesh`` shards the device stage
    over every chip, and ``mask_source`` selects the mask signal, as in
    :func:`eval_episode`.
    """
    if run_crf:
        from critic_vae_tpu.crf.policy import resolve_crf_backend

        crf_backend = resolve_crf_backend(
            crf_backend, frames_u8.shape[1], frames_u8.shape[2]
        )
    host, diff_chunks, valids = episode_device_stage(
        vae_params, bn_state, critic_params, frames_u8, batch_size,
        with_recons=False, compute_dtype=compute_dtype, mesh=mesh, fetch=False,
        mask_source=mask_source, saliency_opts=saliency_opts,
    )
    mean_max = np.asarray(jnp.mean(jnp.asarray(host["max_value"])))

    t_arr = np.asarray(list(thresholds), np.int32)
    # The sweep's masks exist only to feed the CRF (the returned results are
    # IoU stats). For the device-CRF backend keep them device-resident — the
    # (T, N, H, W) uint8 stack is ~29 MB at episode scale, a ~2 s fetch plus
    # a re-upload through this mount's tunnel that the on-device mean-field
    # never needs. Multi-host still fetches: chunk concat outside jit needs
    # fully-addressable arrays, and _fetch's allgather already handles it.
    masks_on_device = (
        run_crf and crf_backend == "device" and jax.process_count() == 1
    )
    need_host_masks = run_crf and not masks_on_device
    mask_parts = []
    tp = fn = fp = 0
    offset = 0
    for ci, valid in enumerate(valids):
        _, masks_c = _normalize_threshold_chunk(diff_chunks[ci], mean_max, t_arr)
        masks_v = masks_c[:, :valid]  # device slice; ≤2 shapes per episode
        # gt slice stays numpy: under multi-host jit a process-local committed
        # array cannot mix with global-mesh operands, but host numpy can
        ctp, cfn, cfp = _sweep_chunk_stats(masks_v, gt[offset : offset + valid])
        want = {"tp": ctp, "fn": cfn, "fp": cfp}
        if need_host_masks:
            want["m"] = masks_v
        st = _fetch(want)
        if masks_on_device:
            mask_parts.append(masks_v)
        elif need_host_masks:
            mask_parts.append(st["m"])
        tp, fn, fp = tp + st["tp"].astype(np.int64), fn + st["fn"].astype(np.int64), fp + st["fp"].astype(np.int64)
        offset += valid
    masks = None  # (T, N, H, W); host or device per the flags above
    if masks_on_device:
        masks = jnp.concatenate(mask_parts, axis=1)
    elif need_host_masks:
        masks = np.concatenate(mask_parts, axis=1)
    # exact ops.iou.iou semantics: python-int counts (no int32 overflow at
    # episode scale), f64 division, 0/0 -> 1
    union = tp + fn + fp
    thr_ious = [
        1.0 if int(u) == 0 else int(t) / int(u) for t, u in zip(tp, union)
    ]

    crf_refined = None
    if run_crf and crf_backend == "device":
        # lane-packed sweep refinement: all T thresholds' mean-fields share
        # one bilateral build and one set of per-iteration matrix reads
        # (crf/device.py::refine_masks_multi_device) — measured ~9x the 13
        # sequential per-threshold refinements
        from critic_vae_tpu.crf.device import refine_masks_multi_device

        # fetch=False when single-process: the refined stack exists only to
        # be scored, so it stays on device and the per-threshold IoUs come
        # back as (T,) int32 counts — the ~27 MB mask fetch through the
        # tunnel cost more than the mean-field itself (docs/DESIGN.md)
        crf_refined = refine_masks_multi_device(
            frames_u8, masks, crf_params, mesh=mesh,
            fetch=not masks_on_device,
        )

    crf_ious = None
    if crf_refined is not None and isinstance(crf_refined, jax.Array):
        ctp, cfn, cfp = _fetch(_sweep_chunk_stats(crf_refined, gt))
        crf_ious = []
        for ti in range(len(thresholds)):
            union = int(ctp[ti]) + int(cfn[ti]) + int(cfp[ti])
            crf_ious.append(
                1.0 if union == 0 else round(int(ctp[ti]) / union, 3)
            )

    results = []
    for ti, t in enumerate(thresholds):
        crf_iou_val = None
        if run_crf:
            if crf_ious is not None:
                crf_iou_val = crf_ious[ti]
            elif crf_refined is not None:
                crf_iou_val = iou(gt, crf_refined[ti])
            else:
                crf_masks = _refine(frames_u8, masks[ti], crf_params,
                                    crf_backend, num_threads, mesh=mesh)
                crf_iou_val = iou(gt, crf_masks)
        results.append(
            {
                "threshold": int(t),
                "thr_iou": round(float(thr_ious[ti]), 3),
                "crf_iou": crf_iou_val,
            }
        )
    return results


def bin_diagnostics(
    preds: np.ndarray, gt: np.ndarray, thr_masks: np.ndarray
) -> Dict:
    """Per-critic-bin IoU/frame/GT-pixel diagnostics
    (reference: save_bin_info, vae_utility.py:112-145).

    Bins are round(pred, 1) in first-seen order, like the reference's
    defaultdicts.
    """
    per_frame_iou = iou_batch(thr_masks, gt)  # reference arg order: (mask, gt)
    bin_ious: Dict[float, List[float]] = defaultdict(list)
    bin_frames: Dict[float, int] = defaultdict(int)
    bin_gts: Dict[float, int] = defaultdict(int)
    for i, pred in enumerate(preds):
        b = round(float(pred), 1)
        bin_ious[b].append(round(float(per_frame_iou[i]), 3))
        bin_frames[b] += 1
        bin_gts[b] += int(np.sum(gt[i]))
    return {"ious": dict(bin_ious), "frames": dict(bin_frames), "gts": dict(bin_gts)}


def write_bin_info(diag: Dict, out_path: str, total_frames: int) -> None:
    """Write the bin_info text file in the reference's format.

    Deliberate fix vs the reference: frame percentages divide by the actual
    frame count, not a hardcoded 1200 (vae_utility.py:124 divides 550
    processed frames by 1200); and singleton bins report std 0.00 instead of
    crashing statistics.stdev.
    """
    import statistics

    total_gt = sum(diag["gts"].values())
    with open(out_path, "w") as f:
        f.write("ground truth pixels sorted by bin:\n")
        for b, count in diag["gts"].items():
            pct = round(count / total_gt, 2) * 100 if total_gt else 0.0
            f.write(f"bin: {b}, pixels = {count} = {pct}%\n")
        f.write("\nframes separated by bin:\n")
        for b, count in diag["frames"].items():
            f.write(f"bin: {b}, frames = {count} = {round(count / total_frames, 2) * 100}%\n")
        f.write("\niou-mean and std:\n")
        for b, ious in diag["ious"].items():
            mean = round(statistics.mean(ious), 2)
            std = round(statistics.stdev(ious), 2) if len(ious) > 1 else 0.0
            f.write(f"bin: {b}, iou_mean={mean}, iou_std={std}\n")


def compose_frames(
    frames_u8: np.ndarray, result: EpisodeResult, gt: Optional[np.ndarray],
    threshold: int
) -> List:
    """Render the annotated strips (host, PIL): 7 panels with ground truth,
    the 4-panel layout without (unlabeled episodes)."""
    from critic_vae_tpu.viz.panels import final_frame

    out = []
    crf = result.crf_masks if result.crf_masks is not None else np.zeros_like(result.thr_masks)
    for i in range(len(frames_u8)):
        out.append(
            final_frame(
                frames_u8[i],
                result.recon_one[i],
                result.recon_zero[i],
                result.diff_u8[i],
                result.preds[i],
                gt=gt[i] if gt is not None else None,
                thr_mask=result.thr_masks[i],
                crf_mask=crf[i],
                thr_iou=result.thr_iou,
                crf_iou=result.crf_iou,
                threshold=threshold,
            )
        )
    return out
