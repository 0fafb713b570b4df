"""Horizontal-flip test-time augmentation for LayerCAM masks (round 4).

The LayerCAM mask source (ops/saliency.py, measured best at thr-IoU
0.524) is deterministic and single-pass; the one classic CAM upgrade not
yet tried here is flip-TTA: average the CAM of the frame and the
un-flipped CAM of the horizontally-flipped frame. The critic is not
flip-equivariant (nothing in training enforced it), so the two maps
carry partly independent localization error; averaging can cancel it —
or dilute the support like every fusion probed before (docs/DESIGN.md
guided-fusion / block-fusion negatives).

CPU-exact probe, same machinery and mean-max normalization as
examples/saliency_experiment.py::_probe_cam: full combiner grid
{mean, max, min, gmean} on the default seed-9999 episode (550 frames),
best combiner re-evaluated on the seed-4242/777 episodes, vs the
cam-alone baselines 0.524/0.522/0.526.

Run: python examples/cam_tta_probe.py [out.json]   (forces CPU)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(out_path="/tmp/cam_tta.json"):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from critic_vae_tpu.data.synthetic import generate_frames
    from critic_vae_tpu.models.critic import load_critic
    from critic_vae_tpu.ops.iou import iou
    from critic_vae_tpu.ops.saliency import critic_saliency

    critic = load_critic(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "saved-networks", "critic-synthetic.npz"))

    def maps(frames_u8):
        x = jnp.asarray(frames_u8.astype(np.float32) / 255.0)
        f = jax.jit(lambda xb: critic_saliency(
            critic, xb, method="layercam", cam_block=1)[1])
        return np.concatenate([np.asarray(f(x[i:i + 128]))
                               for i in range(0, len(x), 128)])

    def best_of_maps(sal, gt_b):
        mm = sal.max(axis=(1, 2)).mean()
        u8 = np.clip(sal / max(mm, 1e-12) * 255.0, 0, 255).astype(np.uint8)
        return max(iou(gt_b, u8 > t) for t in range(0, 254, 2))

    def n01(m):
        return m / np.maximum(m.max(axis=(1, 2), keepdims=True), 1e-12)

    combiners = {
        "mean": lambda a, b: 0.5 * (a + b),
        "max": np.maximum,
        "min": np.minimum,
        "gmean": lambda a, b: np.sqrt(a * b),
    }

    res = {}
    frames, gt = generate_frames(550, seed=9999)
    cam = maps(frames)
    cam_f = maps(frames[:, :, ::-1])[:, :, ::-1]
    res["seed9999"] = {"cam_alone": best_of_maps(cam, gt),
                       "flipped_alone": best_of_maps(cam_f, gt)}
    for name, fn in combiners.items():
        res["seed9999"][f"tta_{name}"] = best_of_maps(
            fn(n01(cam), n01(cam_f)), gt)
        # raw (un-normalized) average too — normalization per-frame can
        # re-weight the two views differently
        res["seed9999"][f"tta_{name}_raw"] = best_of_maps(
            fn(cam, cam_f), gt)
    print("seed9999:", json.dumps(res["seed9999"], indent=1), flush=True)

    best_key = max((k for k in res["seed9999"] if k.startswith("tta_")),
                   key=res["seed9999"].get)
    res["best_combiner"] = best_key
    for seed in (4242, 777):
        f2, g2 = generate_frames(550, seed=seed)
        c2 = maps(f2)
        c2f = maps(f2[:, :, ::-1])[:, :, ::-1]
        name = best_key.replace("tta_", "").replace("_raw", "")
        a, b = ((c2, c2f) if best_key.endswith("_raw")
                else (n01(c2), n01(c2f)))
        res[f"seed{seed}"] = {
            "cam_alone": best_of_maps(c2, g2),
            best_key: best_of_maps(combiners[name](a, b), g2),
        }
        print(f"seed{seed}:", json.dumps(res[f"seed{seed}"]), flush=True)

    # Does the thr-IoU win carry through the CAM-tuned CRF (the 0.79-0.81
    # headline, docs/artifacts/cam_crf_tuning.json)? Same pipeline path as
    # examples/cam_crf_tuning.py: eval_episode(layercam[, tta]) thr_masks
    # at a threshold sweep, refined on the host lattice with the tuned
    # tuple, per seed.
    from critic_vae_tpu.crf import refine_masks
    from critic_vae_tpu.models.vae import init_vae_params
    from critic_vae_tpu.pipelines.video import eval_episode

    TUNED = (132.0, 32.0, 3.1, 8.0, 1.8, 10)
    params, bn = init_vae_params(jax.random.key(0))
    res["crf_tuned"] = {}
    for seed in (9999, 4242, 777):
        frames, gt = generate_frames(550, seed=seed)
        row = {}
        for label, tta in (("cam", False), ("tta", True)):
            best = (0.0, None)
            for thr in (64, 80, 96, 112, 128):
                r = eval_episode(
                    params, bn, critic, frames, gt, threshold=thr,
                    run_crf=False, with_recons=False, mask_source="saliency",
                    saliency_opts={"method": "layercam", "tta_flip": tta},
                    batch_size=128,
                )
                crf_iou = iou(gt, refine_masks(frames, r.thr_masks, TUNED))
                row[f"{label}_thr{thr}"] = {
                    "thr_iou": round(r.thr_iou, 4),
                    "crf_iou": round(crf_iou, 4),
                }
                if crf_iou > best[0]:
                    best = (crf_iou, thr)
            row[f"{label}_best"] = {"crf_iou": round(best[0], 4),
                                    "at_thr": best[1]}
        res["crf_tuned"][f"seed{seed}"] = row
        print(f"crf seed{seed}:", json.dumps(row), flush=True)

    with open(out_path, "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    main(*sys.argv[1:])
