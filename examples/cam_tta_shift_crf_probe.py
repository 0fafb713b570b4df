"""CRF impact + shift-radius sensitivity of the flip+shift TTA stack.

Companion to examples/cam_tta_shift_probe.py (which found flip + ±2px
horizontal min-combining lifts thr-IoU 0.554/0.552/0.559 →
0.570/0.568/0.575): (a) does the extra thr-IoU survive the CAM-tuned CRF
(flip-only reached 0.803/0.815/0.814)? (b) is D=2 special, or a plateau?
Runs the SHIPPED pipeline path (eval_episode + saliency_opts) so the
numbers are pipeline-level, not probe-level.

Run: python examples/cam_tta_shift_crf_probe.py [out.json]   (forces CPU)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(out_path="/tmp/cam_tta_shift_crf.json"):
    import jax

    jax.config.update("jax_platforms", "cpu")

    from critic_vae_tpu.crf import refine_masks
    from critic_vae_tpu.data.synthetic import generate_frames
    from critic_vae_tpu.models.critic import load_critic
    from critic_vae_tpu.models.vae import init_vae_params
    from critic_vae_tpu.ops.iou import iou
    from critic_vae_tpu.pipelines.video import eval_episode

    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    TUNED = (132.0, 32.0, 3.1, 8.0, 1.8, 10)
    critic = load_critic(os.path.join(REPO, "saved-networks",
                                      "critic-synthetic.npz"))
    params, bn = init_vae_params(jax.random.key(0))

    res = {}

    # (b) shift-radius grid, seed 9999, thr-IoU through the pipeline
    frames, gt = generate_frames(550, seed=9999)
    res["radius_thr_iou_seed9999"] = {}
    for d in (1, 2, 3):
        best = 0.0
        for thr in (64, 80, 96):
            r = eval_episode(
                params, bn, critic, frames, gt, threshold=thr,
                run_crf=False, with_recons=False, mask_source="saliency",
                saliency_opts={"method": "layercam", "tta_flip": True,
                               "tta_shift": d},
                batch_size=128,
            )
            best = max(best, r.thr_iou)
        res["radius_thr_iou_seed9999"][f"D={d}"] = round(best, 4)
        print(f"D={d}: best thr-IoU {best}", flush=True)

    # (a) CRF at the flip+2 stack, 3 seeds
    res["crf_tuned_flip_shift2"] = {}
    for seed in (9999, 4242, 777):
        frames, gt = generate_frames(550, seed=seed)
        best = (0.0, None)
        for thr in (64, 80, 96):
            r = eval_episode(
                params, bn, critic, frames, gt, threshold=thr,
                run_crf=False, with_recons=False, mask_source="saliency",
                saliency_opts={"method": "layercam", "tta_flip": True,
                               "tta_shift": 2},
                batch_size=128,
            )
            crf_iou = iou(gt, refine_masks(frames, r.thr_masks, TUNED))
            if crf_iou > best[0]:
                best = (crf_iou, thr)
        res["crf_tuned_flip_shift2"][f"seed{seed}"] = {
            "crf_iou": round(best[0], 4), "at_thr": best[1]}
        print(f"seed{seed}: CRF {best[0]} @ t={best[1]}", flush=True)

    with open(out_path, "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    main(*sys.argv[1:])
