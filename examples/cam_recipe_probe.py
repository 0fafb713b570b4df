"""Which critic-training recipe makes LayerCAM survive retraining?
(round 5, VERDICT r4 #1 — the diagnosis/mitigation experiment.)

The cam_health probe (examples/cam_health_probe.py, docs/artifacts/
cam_health.json) reproduced the round-4 finding: a binary-label critic at
the ablations recipe reaches 1.000 holdout accuracy with DEGENERATE
LayerCAM (block-1 thr-IoU 0.126 vs the bundled critic's 0.524), and found
one health metric that discriminates sharply WITHOUT ground truth:
``deletion_drop`` (erase the thresholded-CAM support with the frame mean
color; a faithful CAM guts the prediction — bundled 0.42 vs fresh 0.08).
Flip-consistency and the round-4 empty-mask rate do NOT discriminate.

Mechanism hypothesis: the bundled critic was trained with SOFT
trunk-fraction labels (docs/RESULTS.md round-1 recipe: "calibrated critic
(soft trunk-fraction labels, 15 epochs)"), not binary visibility. A binary
classifier saturates once ANY sufficient evidence is found — on this
distribution the leaf canopy co-occurs with every trunk (data/synthetic.py
draws a canopy above each trunk), so a shortcut reader classifies
perfectly while its CAM ignores the trunk. An area-regression target makes
the logit scale with trunk EXTENT, forcing spatially-distributed evidence.

This probe trains 3 seeds × 3 recipes on the TPU —

  * ``binary15``  — binary labels, 15 epochs (the failing recipe);
  * ``soft15``    — trunk-pixel-fraction labels (clipped at the p90
                    positive-frame area), 15 epochs;
  * ``binary3``   — binary labels, 3 epochs (undertraining control: is the
                    bundled critic's CAM just an early-stopping accident?)

— and measures, per critic: holdout binary accuracy, block-1 CAM thr-IoU
(GT, diagnosis only), ``deletion_drop`` (no GT), ``gt_trunk_deletion``
(erase the GT trunk pixels with grass; a shortcut reader keeps its
prediction → canopy-shortcut diagnosis), and for the winning recipe the
ACCEPTANCE metric: the full ``--quality`` TTA chain (LayerCAM +
{id,mirror}×{0,±2} + CAM-tuned CRF) thr/CRF IoU on the three held-out
episode seeds, target within 0.05 of the bundled chain (0.58 / 0.84).

Run: PYTHONPATH=/root/repo:/root/.axon_site python examples/cam_recipe_probe.py [out.json]
Results: docs/artifacts/cam_recipe.json, docs/RESULTS.md round 5.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cam_health_probe import cam_maps, health_metrics, norm_u8, thr_iou_sweep  # noqa: E402

CACHE = "/tmp/cvt-critics-r5"
TUNED = (132.0, 32.0, 3.1, 8.0, 1.8, 10)
GRASS = (96, 140, 56)


def soft_labels(gt):
    import numpy as np

    counts = gt.reshape(len(gt), -1).sum(axis=1).astype(np.float32)
    pos = counts[counts > 0]
    scale = float(np.percentile(pos, 90)) if len(pos) else 1.0
    return np.clip(counts / max(scale, 1.0), 0.0, 1.0)


def gt_trunk_deletion(critic, frames, gt):
    """Mean prediction drop when the GT trunk pixels are painted grass.
    (GT-side diagnosis only — NOT the shipped health metric.) A critic that
    classifies via the co-occurring canopy barely moves."""
    import jax.numpy as jnp
    import numpy as np

    from critic_vae_tpu.data.sampler import score_frames

    f32 = frames.astype(np.float32) / 255.0
    rng = np.random.default_rng(0)
    fill = (np.asarray(GRASS, np.float32)
            + rng.integers(-10, 11, frames.shape).astype(np.float32)) / 255.0
    erased = np.where(gt[..., None], np.clip(fill, 0, 1), f32)
    pos = gt.any(axis=(1, 2))
    p0 = score_frames(critic, f32[pos], 256)
    p1 = score_frames(critic, erased[pos], 256)
    return float((p0 - p1).mean()), float(p0.mean()), float(p1.mean())


def tta_chain_eval(critic, episodes):
    """The acceptance metric: full --quality chain per episode seed."""
    import jax

    from critic_vae_tpu.crf import refine_masks
    from critic_vae_tpu.models.vae import init_vae_params
    from critic_vae_tpu.ops.iou import iou
    from critic_vae_tpu.pipelines.video import eval_episode

    params, bn = init_vae_params(jax.random.key(0))
    out = {}
    for seed, (frames, gt) in episodes.items():
        best_thr, best_crf = (0.0, None), (0.0, None)
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
        out[str(seed)] = {"thr_iou": round(float(best_thr[0]), 4),
                          "crf_iou": round(float(best_crf[0]), 4)}
        print(f"    chain seed{seed}: {out[str(seed)]}", flush=True)
    return out


def main(out_path="/tmp/cam_recipe.json", *, chain_recipes=("soft15",)):
    import jax

    cache = os.path.expanduser("~/.cache/critic_vae_tpu/jax")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import numpy as np

    from critic_vae_tpu.data.synthetic import generate_frames
    from critic_vae_tpu.models.critic import load_critic, save_critic
    from critic_vae_tpu.train.critic import (critic_accuracy,
                                             labels_from_masks, train_critic)

    os.makedirs(CACHE, exist_ok=True)
    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    t0 = time.time()

    cf, cg = generate_frames(12800, seed=0)
    y_bin = labels_from_masks(cg)
    y_soft = soft_labels(cg)
    hold_f, hold_g = generate_frames(2048, seed=31337)
    hold_y = labels_from_masks(hold_g)
    ep_frames, ep_gt = generate_frames(550, seed=9999)
    episodes = {s: generate_frames(550, seed=s) for s in (9999, 4242, 777)}

    recipes = {
        "binary15": dict(labels=y_bin, epochs=15),
        "soft15": dict(labels=y_soft, epochs=15),
        "binary3": dict(labels=y_bin, epochs=3),
    }

    results = {"soft_label_scale_note":
               "counts clipped at p90 of positive-frame trunk areas"}

    def evaluate(name, critic):
        r = {"holdout_acc": round(critic_accuracy(critic, hold_f, hold_y), 4)}
        _, maps = cam_maps(critic, ep_frames, 1)
        v, t = thr_iou_sweep(maps, ep_gt)
        r["block1_thr_iou"] = {"iou": round(v, 4), "at": t}
        h, _, _ = health_metrics(critic, ep_frames)
        r["health"] = h
        d, p_before, p_after = gt_trunk_deletion(critic, ep_frames, ep_gt)
        r["gt_trunk_deletion"] = {
            "drop": round(d, 4), "pred_before": round(p_before, 4),
            "pred_after": round(p_after, 4)}
        print(f"  [{name}] acc={r['holdout_acc']} cam_iou={v:.4f}@{t} "
              f"del={h['deletion_drop']} gt_del={d:.4f}", flush=True)
        return r

    bundled = load_critic(os.path.join(REPO, "saved-networks",
                                       "critic-synthetic.npz"))
    results["bundled"] = evaluate("bundled", bundled)

    for rname, cfg in recipes.items():
        for seed in (0, 1, 2):
            tag = f"{rname}_s{seed}"
            path = os.path.join(CACHE, f"critic-{tag}.npz")
            if os.path.exists(path):
                critic = load_critic(path)
            else:
                print(f"[{tag}] training...", flush=True)
                critic, loss = train_critic(
                    cf, cfg["labels"], epochs=cfg["epochs"], batch_size=128,
                    seed=seed, progress=False)
                save_critic(path, critic)
            results[tag] = evaluate(tag, critic)
            with open(out_path, "w") as f:
                json.dump(results, f, indent=2)

    # acceptance chain for the candidate recipe(s)
    for rname in chain_recipes:
        for seed in (0, 1, 2):
            tag = f"{rname}_s{seed}"
            critic = load_critic(os.path.join(CACHE, f"critic-{tag}.npz"))
            print(f"[{tag}] full TTA chain:", flush=True)
            results[tag]["tta_chain"] = tta_chain_eval(critic, episodes)
            with open(out_path, "w") as f:
                json.dump(results, f, indent=2)

    results["wall_seconds"] = round(time.time() - t0, 1)
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", out_path)


if __name__ == "__main__":
    main(*sys.argv[1:])
