"""Reproduce docs/artifacts/cam_crf_tuning.json — re-tuning the CRF for
LayerCAM masks (docs/RESULTS.md "Re-tuning the CRF for CAM masks").

The reference CRF tuple (22, 12, 3.1, 8, 1.8, 10) was tuned for its
low-contrast recon-diff masks; LayerCAM masks overshoot boundaries with
coarse 16×16 provenance, which the bilateral appearance term fixes when
re-weighted. This script measures, on the 550-frame held-out synthetic
episode (seed 9999) with the bundled critic:

1. threshold × w1 grid on the fast host C++ lattice (seconds/combo);
2. α / γ / w2 refinements at the w1 optimum (host lattice);
3. the winning tuple (132, 32, 3.1, 8, 1.8, 10) verified on the EXACT
   device mean-field across three episode seeds;
4. the host-lattice cross-check of the same tuple (backend independence).

Runs anywhere (CPU-exact: the device formulation under jax CPU is exact
f32; on the TPU the Pallas build stores the kernel in bf16 — ≥99.9%
agreement, docs/DESIGN.md). On this 1-core host the exact-backend steps
take ~5–9 min per 550-frame refinement; pass --host-only to skip them.

Run: python examples/cam_crf_tuning.py [out.json] [--host-only]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TUNED = (132.0, 32.0, 3.1, 8.0, 1.8, 10)
REFERENCE = (22.0, 12.0, 3.1, 8.0, 1.8, 10)


def main(out_path, host_only=False):
    import jax

    # CRITIC_VAE_TPU_PLATFORM=cpu forces the backend BEFORE first device
    # touch (needed on this mount when the tunneled TPU is down: the env
    # var JAX_PLATFORMS alone loses to the container's sitecustomize hook,
    # CLAUDE.md "Environment hazards")
    plat = os.environ.get("CRITIC_VAE_TPU_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)

    from critic_vae_tpu.crf import refine_masks
    from critic_vae_tpu.crf.device import refine_masks_device
    from critic_vae_tpu.data.synthetic import generate_frames
    from critic_vae_tpu.models.critic import load_critic
    from critic_vae_tpu.models.vae import init_vae_params
    from critic_vae_tpu.ops.iou import iou
    from critic_vae_tpu.pipelines.video import eval_episode

    critic = load_critic(os.path.join(REPO, "saved-networks",
                                      "critic-synthetic.npz"))
    params, bn = init_vae_params(jax.random.key(0))

    def cam_masks(seed, thr):
        frames, gt = generate_frames(550, seed=seed)
        r = eval_episode(
            params, bn, critic, frames, gt, threshold=thr, run_crf=False,
            with_recons=False, mask_source="saliency",
            saliency_opts={"method": "layercam"}, batch_size=128,
        )
        return frames, gt, r

    res = {"reference_params": REFERENCE, "tuned_params": TUNED}

    # 1. threshold x w1 (host lattice)
    res["host_threshold_x_w1"] = {}
    cache = {}
    for thr in (64, 80, 96, 112, 128):
        frames, gt, r = cam_masks(9999, thr)
        cache[thr] = (frames, gt, r)
        row = {"thr_iou": r.thr_iou}
        for w1 in (22.0, 44.0, 66.0, 88.0, 132.0):
            out = refine_masks(frames, r.thr_masks,
                               (w1, 12.0, 3.1, 8.0, 1.8, 10))
            row[f"w1={w1:g}"] = round(iou(gt, out), 4)
        res["host_threshold_x_w1"][str(thr)] = row
        print(thr, row, flush=True)

    # 2. alpha / gamma / w2 refinements at thr=96, w1=88 (host lattice)
    frames, gt, r = cache[96]
    for key, grids in (("alpha", (6.0, 12.0, 18.0, 24.0, 32.0, 48.0, 96.0)),
                       ("gamma", (1.0, 1.8, 3.0, 5.0)),
                       ("w2", (0.0, 4.0, 8.0, 16.0, 32.0))):
        base = dict(zip(("w1", "alpha", "beta", "w2", "gamma", "iters"),
                        (88.0, 12.0, 3.1, 8.0, 1.8, 10)))
        grid = {}
        for v in grids:
            p = dict(base, **{key: v})
            out = refine_masks(frames, r.thr_masks, tuple(p.values()))
            grid[str(v)] = round(iou(gt, out), 4)
        res[f"host_{key}_at_w1_88"] = grid
        print(key, grid, flush=True)

    # 3+4. winning tuple: exact backend across seeds + host cross-check
    res["host_tuned_seed9999"] = round(
        iou(gt, refine_masks(frames, r.thr_masks, TUNED)), 4)
    if not host_only:
        res["exact_tuned_by_seed"] = {}
        res["exact_reference_by_seed"] = {}
        for seed in (9999, 4242, 777):
            frames, gt, r = cache[96] if seed == 9999 else cam_masks(seed, 96)
            for name, p in (("exact_tuned_by_seed", TUNED),
                            ("exact_reference_by_seed", REFERENCE)):
                out = refine_masks_device(frames, r.thr_masks, p)
                res[name][str(seed)] = round(iou(gt, out), 4)
                print(seed, name, res[name][str(seed)], flush=True)

    with open(out_path, "w") as f:
        json.dump(res, f, indent=2)
    print("wrote", out_path, flush=True)


if __name__ == "__main__":
    known = {"--host-only"}
    unknown = [a for a in sys.argv[1:] if a.startswith("--") and a not in known]
    if unknown:
        raise SystemExit(f"unknown flag(s) {unknown}; known: {sorted(known)}")
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    main(args[0] if args else os.path.join(REPO, "docs", "artifacts",
                                           "cam_crf_tuning.json"),
         host_only="--host-only" in sys.argv)
