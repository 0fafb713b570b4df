"""Reproduce docs/artifacts/saliency.json — the saliency mask-source study.

Measures, through the SHIPPED pipeline (pipelines/video.py::threshold_sweep
with crf_backend="device"), on the 550-frame held-out synthetic episode:

1. **deterministic saliency** (the `--mask-source saliency` default):
   coarse 0..120 sweep + fine sweep around the best threshold + resident
   throughput of the saliency stage at batch 1024 (bench.py conditions).
2. **SmoothGrad-logit saliency** (`--saliency-logits --saliency-noise 0.08
   --saliency-samples 8 --saliency-sigma 1.0`): coarse 0..250 sweep (the
   averaged maps concentrate mass — the best threshold moves past the
   reference's 0..120 range), fine sweep, 3-seed robustness at the best
   threshold, and throughput.
3. **LayerCAM** (`--saliency-method layercam`): coarse+fine sweep and
   throughput for the measured-best deterministic estimator
   (ReLU(∂logit/∂A ⊙ A) over block 1, ops/saliency.py).

The probe-level tuning grids recorded under "sg_tuning" (noise, sigma,
sample count) and "cam_tuning" (tap block, episode-seed robustness,
SmoothGrad-over-CAM) came from direct critic_saliency sweeps with the
same mean-max normalization; re-run those with --tune (adds ~10 min).

Run: python examples/saliency_experiment.py [out.json] [--cam-only] (expects
a TPU; defaults to docs/artifacts/saliency.json; --cam-only merges section 3
into an existing artifact). Results quoted in docs/RESULTS.md "Breaking the
ceiling" and README.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SG_OPTS = {"logits": True, "samples": 8, "noise": 0.08, "seed": 0,
           "sigma": 1.0}


def _sweep(params, bn, critic, frames, gt, thresholds, opts=None):
    from critic_vae_tpu.pipelines.video import threshold_sweep

    return threshold_sweep(
        params, bn, critic, frames, gt, thresholds=list(thresholds),
        run_crf=True, crf_backend="device", mask_source="saliency",
        saliency_opts=opts,
    )


def _coarse_plus_fine(params, bn, critic, frames, gt, coarse, opts=None):
    sweep = _sweep(params, bn, critic, frames, gt, coarse, opts)
    best = max(sweep, key=lambda r: r["thr_iou"])
    lo = max(0, best["threshold"] - 10)
    fine = _sweep(params, bn, critic, frames, gt,
                  range(lo, best["threshold"] + 12, 2), opts)
    return sweep, best, fine, max(fine, key=lambda r: r["thr_iou"])


def _throughput(params, bn, critic, frames, **saliency_kw):
    import jax.numpy as jnp

    from critic_vae_tpu.ops.mask import episode_forward

    xb = jnp.asarray(np.repeat(frames[:512], 2, 0))  # 1024 resident frames
    kw = dict(with_recons=False, mask_source="saliency", **saliency_kw)
    out = episode_forward(params, bn, critic, xb, **kw)
    np.asarray(out["preds"][:1])  # warm + real barrier (CLAUDE.md: tunnel)
    t0 = time.time()
    for _ in range(20):
        out = episode_forward(params, bn, critic, xb, **kw)
    np.asarray(out["preds"][:1])
    return round(1024 / ((time.time() - t0) / 20))


def _probe_tuning(critic, frames, gt):
    """Direct critic_saliency grids (noise / sigma / samples)."""
    import jax
    import jax.numpy as jnp

    from critic_vae_tpu.ops.iou import iou
    from critic_vae_tpu.ops.saliency import critic_saliency

    x = jnp.asarray(frames.astype(np.float32) / 255.0)

    def best_iou(**kw):
        f = jax.jit(lambda xb, k: critic_saliency(critic, xb, key=k, **kw)[1])
        sal = np.concatenate([np.asarray(f(x[i:i + 128], jax.random.key(i)))
                              for i in range(0, len(x), 128)])
        mm = sal.max(axis=(1, 2)).mean()
        u8 = np.clip(sal / max(mm, 1e-12) * 255.0, 0, 255).astype(np.uint8)
        return max(iou(gt, u8 > t) for t in range(0, 254, 2))

    base = dict(logits=True, samples=8, noise=0.08)
    return {
        "samples": {str(n): best_iou(**{**base, "samples": n})
                    for n in (8, 16, 32)},
        "sigma_at_n8_noise0.08": {
            str(s): best_iou(**base, smooth_sigma=s)
            for s in (0.0, 0.5, 0.75, 1.0, 1.25, 1.5, 2.0, 2.5, 3.0)
        },
        "noise_at_sigma1.0": {
            str(nz): best_iou(**{**base, "noise": nz}, smooth_sigma=1.0)
            for nz in (0.06, 0.07, 0.08, 0.09, 0.10)
        },
        "note": "probe-level (direct critic_saliency + mean-max normalize), "
                "same machinery as the pipeline; pipeline-level sweep below",
    }


def _probe_cam(critic, frames, gt):
    """Direct critic_saliency CAM grids: tap block, episode-seed
    robustness, SmoothGrad-over-CAM (all deterministic except the latter).
    Same mean-max normalization as _probe_tuning."""
    import jax
    import jax.numpy as jnp

    from critic_vae_tpu.data.synthetic import generate_frames
    from critic_vae_tpu.ops.iou import iou
    from critic_vae_tpu.ops.saliency import critic_saliency

    def best_of_maps(sal, gt_b):
        mm = sal.max(axis=(1, 2)).mean()
        u8 = np.clip(sal / max(mm, 1e-12) * 255.0, 0, 255).astype(np.uint8)
        return max(iou(gt_b, u8 > t) for t in range(0, 254, 2))

    def maps(frames_u8, **kw):
        x = jnp.asarray(frames_u8.astype(np.float32) / 255.0)
        f = jax.jit(lambda xb, k: critic_saliency(critic, xb, key=k, **kw)[1])
        return np.concatenate([np.asarray(f(x[i:i + 128], jax.random.key(i)))
                               for i in range(0, len(x), 128)])

    def best_iou(frames_u8, gt_b, **kw):
        return best_of_maps(maps(frames_u8, **kw), gt_b)

    def _grid(name, items):
        out = {}
        for key, kw in items:
            out[key] = best_iou(*kw[0], **kw[1])
            print(f"  cam probe {name}[{key}] = {out[key]}", flush=True)
        return out

    res = {
        "block": _grid("block", [
            (str(b), ((frames, gt),
                      dict(method="layercam", cam_block=b)))
            for b in range(4)]),
        "smoothgrad_over_cam_n8": _grid("sg_over_cam", [
            (str(nz), ((frames, gt),
                       dict(method="layercam", cam_block=1,
                            samples=8, noise=nz)))
            for nz in (0.05, 0.08, 0.12)]),
        "note": "probe-level (direct critic_saliency + mean-max normalize); "
                "block 0 is too local, 2-3 too coarse; input noise buys "
                "nothing on CAM maps; pipeline-level sweep under cam_*",
    }
    # per-block fusions (the docstring's product/min/sum/sqrt <= 0.455
    # claim) and the smoothing-sigma grid (blur only costs IoU on CAM)
    M = {b: maps(frames, method="layercam", cam_block=b, smooth_sigma=0)
         for b in range(4)}

    def n01(m):
        return m / np.maximum(m.max(axis=(1, 2), keepdims=True), 1e-12)

    fusions = {
        "b1xb2": n01(M[1]) * n01(M[2]),
        "b1xb2xb3": n01(M[1]) * n01(M[2]) * n01(M[3]),
        "sqrt_b1xb2": np.sqrt(n01(M[1]) * n01(M[2])),
        "b1+b2": n01(M[1]) + n01(M[2]),
        "min_b1b2": np.minimum(n01(M[1]), n01(M[2])),
    }
    res["fusion"] = {k: best_of_maps(v, gt) for k, v in fusions.items()}
    print("  cam probe fusion:", res["fusion"], flush=True)
    # Guided-Grad-CAM-style fusion: mask the (coarse-but-accurate) CAM with
    # the (sharp-but-speckled) pixel gradient. Every exponent/smoothing
    # combo DILUTES (0.52 -> <=0.37, 3-seed-consistent): the logit
    # gradient's speckle punches holes in the CAM's support faster than its
    # resolution sharpens the boundary — same failure mode as the block
    # fusions above. Negative result recorded in docs/DESIGN.md.
    def guided_grid(fr, gt_b, cam_b1):
        grid = {}
        for gsig in (0.0, 1.0, 1.5):
            G = n01(maps(fr, logits=True, smooth_sigma=gsig))
            for p in (0.25, 0.5, 1.0):
                grid[f"cam*grad^{p}_s{gsig}"] = best_of_maps(
                    n01(cam_b1) * G ** p, gt_b)
            grid[f"min_cam_grad_s{gsig}"] = best_of_maps(
                np.minimum(n01(cam_b1), G), gt_b)
        return grid

    # 3-seed structure matching the committed artifact (ADVICE r3: a
    # single-seed rerun must not silently overwrite the cited 3-seed
    # evidence): full grid on the default seed-9999 episode, then the
    # grid's best combo re-evaluated on the seed-4242/777 episodes.
    guided = guided_grid(frames, gt, M[1])
    best_key = max(guided, key=guided.get)
    gsig_best = float(best_key.rsplit("_s", 1)[1])
    res["guided_fusion"] = {
        "note": "Guided-Grad-CAM-style probe (CPU-exact, 3 seeds): "
                "n01(CAM_b1) x n01(|logit input-grad|)^p, grad smoothed "
                "sigma in {0,1.0,1.5}; every combo dilutes vs cam_alone "
                "0.524/0.522/0.526 — the gradient's speckle punches holes "
                "in the CAM support. Reproduce: _probe_cam guided_fusion "
                "grid.",
        "seed9999": guided,
    }
    for seed in (4242, 777):
        f2, g2 = generate_frames(550, seed=seed)
        cam2 = maps(f2, method="layercam", cam_block=1, smooth_sigma=0)
        G2 = n01(maps(f2, logits=True, smooth_sigma=gsig_best))
        if best_key.startswith("min_cam_grad"):
            fused2 = np.minimum(n01(cam2), G2)
        else:
            p_best = float(best_key.split("^")[1].split("_")[0])
            fused2 = n01(cam2) * G2 ** p_best
        res["guided_fusion"][f"seed{seed}_best"] = best_of_maps(fused2, g2)
    print("  cam probe guided_fusion:", res["guided_fusion"], flush=True)
    res["sigma"] = {str(s): best_iou(frames, gt, method="layercam",
                                     cam_block=1, smooth_sigma=s)
                    for s in (0.0, 1.0, 1.5)}
    print("  cam probe sigma:", res["sigma"], flush=True)
    res["upsample"] = _grid("upsample", [
        (k, ((frames, gt),
             dict(method="layercam", cam_block=1, cam_upsample=k)))
        for k in ("bilinear", "bicubic", "lanczos3")])
    res["episode_seed"] = {}
    for seed in (4242, 777):
        f2, g2 = generate_frames(550, seed=seed)
        res["episode_seed"][str(seed)] = {
            "layercam_b1": best_iou(f2, g2, method="layercam", cam_block=1),
            "sg_logit_grad": best_iou(
                f2, g2, logits=True, samples=8, noise=0.08, smooth_sigma=1.0),
        }
    return res


def main(out_path, tune=False, cam_only=False):
    import jax

    cache = os.path.expanduser("~/.cache/critic_vae_tpu/jax")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from critic_vae_tpu.data.synthetic import generate_frames
    from critic_vae_tpu.models.critic import load_critic
    from critic_vae_tpu.models.vae import init_vae_params

    frames, gt = generate_frames(550, seed=9999)
    critic = load_critic(os.path.join(REPO, "saved-networks",
                                      "critic-synthetic.npz"))
    # the saliency mask path never touches the VAE; fresh params are fine
    params, bn = init_vae_params(jax.random.key(0))
    res = {}
    if cam_only:
        # merge-only mode must never silently degrade into a partial
        # artifact: the det/sg sections it skips are quoted by docs
        if not os.path.exists(out_path):
            raise SystemExit(
                f"--cam-only merges into an existing artifact, but "
                f"{out_path} does not exist (typo'd path?) — run the full "
                f"experiment first or fix the path")
        with open(out_path) as f:
            res = json.load(f)

    if not cam_only:
        # 1. deterministic (reference-range sweep: the signal peaks in-range)
        sweep, best, fine, fb = _coarse_plus_fine(
            params, bn, critic, frames, gt, range(0, 130, 10))
        res.update(sweep=sweep, best=best, fine_sweep=fine, fine_best=fb)
        print("deterministic best:", fb, flush=True)
        res["saliency_stage_frames_per_sec"] = _throughput(
            params, bn, critic, frames)

        # 2. SmoothGrad-logit (extended range: best threshold ≈ 122)
        res["sg_opts"] = SG_OPTS
        if tune:
            res["sg_tuning"] = _probe_tuning(critic, frames, gt)
        sweep, best, fine, fb = _coarse_plus_fine(
            params, bn, critic, frames, gt, range(0, 251, 10), SG_OPTS)
        res.update(sg_sweep=sweep, sg_best=best, sg_fine_sweep=fine,
                   sg_fine_best=fb)
        print("smoothgrad-logit best:", fb, flush=True)
        for seed in (101, 202):
            s = _sweep(params, bn, critic, frames, gt, [fb["threshold"]],
                       dict(SG_OPTS, seed=seed))
            res[f"sg_seed{seed}_thr_iou"] = s[0]["thr_iou"]
            print(f"seed {seed}: {s[0]['thr_iou']}", flush=True)
        res["sg_stage_frames_per_sec"] = _throughput(
            params, bn, critic, frames, saliency_logits=True,
            saliency_samples=8, saliency_noise=0.08, saliency_sigma=1.0,
            saliency_seed=np.uint32(0))

    # 3. LayerCAM (block 1, deterministic — the measured-best estimator)
    CAM_OPTS = {"method": "layercam", "cam_block": 1}
    res["cam_opts"] = CAM_OPTS
    if tune or cam_only:
        res["cam_tuning"] = _probe_cam(critic, frames, gt)
        print("cam tuning:", res["cam_tuning"], flush=True)
    sweep, best, fine, fb = _coarse_plus_fine(
        params, bn, critic, frames, gt, range(0, 251, 10), CAM_OPTS)
    res.update(cam_sweep=sweep, cam_best=best, cam_fine_sweep=fine,
               cam_fine_best=fb)
    print("layercam best:", fb, flush=True)
    res["cam_stage_frames_per_sec"] = _throughput(
        params, bn, critic, frames, saliency_method="layercam",
        saliency_cam_block=1)

    # 3b. CRF params were tuned on recon-diff masks; search them for CAM
    # masks at the best threshold (crf_param_search: every combination
    # refines the ORIGINAL threshold masks, scored by whole-stack IoU)
    from critic_vae_tpu.crf.device import crf_param_search
    from critic_vae_tpu.pipelines.video import eval_episode

    thr_masks = eval_episode(
        params, bn, critic, frames, gt, threshold=fb["threshold"],
        run_crf=False, with_recons=False,  # only .thr_masks is consumed
        mask_source="saliency", saliency_opts=CAM_OPTS,
    ).thr_masks
    # CAM masks want a much stronger bilateral term than the diff masks
    # the reference params were tuned for: CPU-exact probes measured
    # 22 -> 0.579, 44 -> 0.760, 88 -> 0.791, 132 -> 0.793 at threshold 96
    _, search = crf_param_search(
        frames, thr_masks, gt,
        {"w1": [22.0, 44.0, 88.0, 132.0, 176.0], "alpha": [12.0, 24.0],
         "beta": [1.55, 3.1], "w2": [8.0, 16.0]},
    )
    res["cam_crf_search_top10"] = [
        {"iou": s, "w1": p[0], "alpha": p[1], "beta": p[2], "w2": p[3],
         "gamma": p[4], "iters": p[5]} for s, p in search[:10]]
    print("cam crf search best:", res["cam_crf_search_top10"][0], flush=True)

    with open(out_path, "w") as f:
        json.dump(res, f, indent=2)
    print("wrote", out_path, flush=True)


if __name__ == "__main__":
    known = {"--tune", "--cam-only"}
    unknown = [a for a in sys.argv[1:] if a.startswith("--") and a not in known]
    if unknown:  # a typo'd flag must not silently launch the full run
        raise SystemExit(f"unknown flag(s) {unknown}; known: {sorted(known)}")
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    main(args[0] if args else os.path.join(REPO, "docs", "artifacts",
                                           "saliency.json"),
         tune="--tune" in sys.argv, cam_only="--cam-only" in sys.argv)
