"""Recipe sweep: close the CAM-IoU gap between soft-label critics and the
bundled one (round 5, VERDICT r4 #1 — stage 2).

cam_recipe_probe measured: binary-label critics are pure SHORTCUT readers
(gt_trunk_deletion = 0.000 on all three seeds — erasing the actual trunk
does not move the prediction; the co-drawn canopy carries the class), and
soft trunk-area labels restore trunk reliance (gt_del 0.36–0.43, health
deletion_drop 0.31–0.34, both past the 0.25 gate) — but block-1 CAM IoU
reaches only 0.31–0.34 vs the bundled critic's 0.52. This sweep varies the
soft-label recipe one axis at a time (1 seed each, ranked by CAM IoU with
the no-GT deletion_drop alongside), then the caller re-validates the
winner on 3 seeds + the full TTA chain (cam_recipe_probe machinery).

Axes: label shaping (p90 clip / sqrt / p99 / binary+soft mix), dropout,
training length, data size, learning rate, and the LayerCAM tap block per
critic (a soft critic's best block need not be 1).

Run: PYTHONPATH=/root/repo:/root/.axon_site python examples/cam_recipe_sweep.py [out.json]
Results: docs/artifacts/cam_recipe_sweep.json, docs/RESULTS.md round 5.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cam_health_probe import cam_maps, thr_iou_sweep  # noqa: E402
from cam_recipe_probe import gt_trunk_deletion, soft_labels  # noqa: E402

CACHE = "/tmp/cvt-critics-r5"


def main(out_path="/tmp/cam_recipe_sweep.json"):
    import jax

    cache = os.path.expanduser("~/.cache/critic_vae_tpu/jax")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import numpy as np

    from critic_vae_tpu.data.synthetic import generate_frames
    from critic_vae_tpu.models.critic import load_critic, save_critic
    from critic_vae_tpu.train.critic import (critic_accuracy, critic_cam_health,
                                             labels_from_masks, train_critic)

    os.makedirs(CACHE, exist_ok=True)
    t0 = time.time()

    cf, cg = generate_frames(12800, seed=0)
    cf25, cg25 = generate_frames(25600, seed=0)
    y_bin = labels_from_masks(cg)
    counts = cg.reshape(len(cg), -1).sum(axis=1).astype(np.float32)
    pos = counts[counts > 0]
    p90 = float(np.percentile(pos, 90))
    p99 = float(np.percentile(pos, 99))
    y_p90 = np.clip(counts / p90, 0, 1)
    y_p99 = np.clip(counts / p99, 0, 1)
    y_sqrt = np.sqrt(y_p90)
    y_mix = 0.5 * y_bin + 0.5 * y_p90

    hold_f, hold_g = generate_frames(2048, seed=31337)
    hold_y = labels_from_masks(hold_g)
    ep_frames, ep_gt = generate_frames(550, seed=9999)

    variants = {
        "soft_p90": dict(frames=cf, labels=y_p90),              # stage-1 ref
        "soft_sqrt": dict(frames=cf, labels=y_sqrt),
        "soft_p99": dict(frames=cf, labels=y_p99),
        "soft_mix": dict(frames=cf, labels=y_mix),
        "soft_d50": dict(frames=cf, labels=y_p90, dropout=0.5),
        "soft_d0": dict(frames=cf, labels=y_p90, dropout=0.0),
        "soft_ep30": dict(frames=cf, labels=y_p90, epochs=30),
        "soft_ep8": dict(frames=cf, labels=y_p90, epochs=8),
        "soft_25k": dict(frames=cf25, labels=np.clip(
            cg25.reshape(len(cg25), -1).sum(1).astype(np.float32) / p90,
            0, 1)),
        "soft_lr3e4": dict(frames=cf, labels=y_p90, lr=3e-4),
    }

    results = {"p90_pixels": p90, "p99_pixels": p99}

    def evaluate(name, critic):
        r = {"holdout_acc": round(critic_accuracy(critic, hold_f, hold_y), 4)}
        best = (0.0, None, None)
        for block in range(4):
            _, maps = cam_maps(critic, ep_frames, block)
            v, t = thr_iou_sweep(maps, ep_gt)
            r[f"block{block}_iou"] = round(v, 4)
            if v > best[0]:
                best = (v, block, t)
        r["best_block"] = {"iou": round(best[0], 4), "block": best[1],
                           "at": best[2]}
        h = critic_cam_health(critic, ep_frames)
        r["deletion_drop"] = round(h["deletion_drop"], 4)
        d, _, _ = gt_trunk_deletion(critic, ep_frames, ep_gt)
        r["gt_trunk_deletion"] = round(d, 4)
        print(f"  [{name}] acc={r['holdout_acc']} best_cam="
              f"{best[0]:.4f}@b{best[1]} del={r['deletion_drop']} "
              f"gt_del={d:.4f} blocks="
              f"{[r[f'block{b}_iou'] for b in range(4)]}", flush=True)
        return r

    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    bundled = load_critic(os.path.join(REPO, "saved-networks",
                                       "critic-synthetic.npz"))
    results["bundled"] = evaluate("bundled", bundled)

    for name, cfg in variants.items():
        path = os.path.join(CACHE, f"critic-sweep-{name}.npz")
        if os.path.exists(path):
            critic = load_critic(path)
        else:
            print(f"[{name}] training...", flush=True)
            critic, _ = train_critic(
                cfg["frames"], cfg["labels"],
                epochs=cfg.get("epochs", 15), batch_size=128,
                learning_rate=cfg.get("lr", 1e-3),
                dropout_rate=cfg.get("dropout", 0.3),
                seed=0, progress=False)
            save_critic(path, critic)
        results[name] = evaluate(name, critic)
        with open(out_path, "w") as f:
            json.dump(results, f, indent=2)

    results["wall_seconds"] = round(time.time() - t0, 1)
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", out_path)


if __name__ == "__main__":
    main(*sys.argv[1:])
