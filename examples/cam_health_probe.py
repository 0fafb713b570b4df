"""Diagnose critic-instance LayerCAM degeneracy + candidate no-GT health
metrics (round 5, VERDICT r4 #1).

Round 4 found the 0.84-IoU LayerCAM+TTA+CRF chain rides one blessed critic
instance: a FRESH critic trained with the ablations recipe reached 1.000
holdout accuracy but produced degenerate LayerCAM (thresholded-CAM IoU
0.073 vs the bundled critic's 0.517 on the identical pipeline;
docs/RESULTS.md "mask self-distillation"). This probe trains several
independent critics (seeds), measures per-block CAM quality against GT
(diagnosis only), and computes candidate NO-GT health metrics so
`traincritic` can gate/select instances without labels:

* ``flip_consistency`` — IoU between the thresholded CAMs of the clean and
  mirrored views (mirrored back). A CAM that localizes real evidence is
  stable under mirroring; a degenerate shortcut map is not. No GT, no VAE.
* ``empty_rate`` — fraction of critic-positive frames whose thresholded CAM
  is empty (the round-4 symptom, pipelines/distill.py warning).
* ``deletion_drop`` — mean drop in critic probability when the CAM support
  is erased (replaced by the frame's border-region mean color): a faithful
  CAM covers the evidence, so erasing it should gut the prediction.
* ``tap_liveness`` — fraction of block-1 tap channels with non-trivial
  activation variance over the episode (dead-channel diagnosis).
* ``cam_top5_mass`` — mean fraction of CAM mass in the top-5% pixels
  (degenerate maps are usually either flat or single-spike).

GT-side ground truth (thr-IoU per block) is computed ONLY to validate which
health metric discriminates — the metrics themselves never touch GT.

Run: python examples/cam_health_probe.py [out.json] [seed...]  (forces CPU)
Results: docs/artifacts/cam_health.json, docs/RESULTS.md round 5.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CACHE = "/tmp/cvt-critics"
THRESHOLDS = list(range(0, 121, 10))


def thr_iou_sweep(maps, gt):
    """Best-threshold IoU of mean-max-normalized maps over the 13-threshold
    pipeline ladder (ops/mask.py normalize/threshold semantics)."""
    import numpy as np

    mean_max = float(np.mean(maps.max(axis=(1, 2))))
    if mean_max == 0:
        return 0.0, 0
    u8 = (np.minimum(maps, mean_max) * (255.0 / mean_max)).astype(np.uint8)
    best = (0.0, 0)
    inter_all = gt.sum()
    for t in THRESHOLDS:
        m = u8 > t
        inter = (m & gt).sum()
        union = m.sum() + inter_all - inter
        v = float(inter / union) if union else 1.0
        if v > best[0]:
            best = (v, t)
    return best


def norm_u8(maps):
    import numpy as np

    mean_max = float(np.mean(maps.max(axis=(1, 2))))
    if mean_max == 0:
        return np.zeros(maps.shape, np.uint8)
    return (np.minimum(maps, mean_max) * (255.0 / mean_max)).astype(np.uint8)


def cam_maps(critic, frames, block, batch=128, tta=False):
    import jax
    import numpy as np

    from critic_vae_tpu.ops.saliency import critic_saliency

    preds, maps = [], []
    f32 = frames.astype(np.float32) / 255.0
    for i in range(0, len(f32), batch):
        p, m = critic_saliency(
            critic, jax.numpy.asarray(f32[i:i + batch]), method="layercam",
            cam_block=block, tta_flip=tta, tta_shift=2 if tta else 0)
        preds.append(np.asarray(p))
        maps.append(np.asarray(m))
    return np.concatenate(preds), np.concatenate(maps)


def health_metrics(critic, frames, block=1, threshold=90):
    """The candidate NO-GT health metrics (module docstring)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from critic_vae_tpu.models.critic import critic_apply
    from critic_vae_tpu.ops.saliency import critic_saliency

    preds, maps = cam_maps(critic, frames, block)
    u8 = norm_u8(maps)
    masks = u8 > threshold
    pos = preds > 0.5
    out = {}
    out["positive_fraction"] = round(float(pos.mean()), 4)
    if pos.any():
        out["empty_rate"] = round(float((~masks[pos].any(axis=(1, 2))).mean()), 4)
    else:
        out["empty_rate"] = 1.0

    # flip consistency: thresholded CAM of mirrored frames, mirrored back
    f32 = frames.astype(np.float32) / 255.0
    _, maps_f = critic_saliency(
        critic, jnp.asarray(f32[:, :, ::-1]), method="layercam",
        cam_block=block)
    masks_f = (norm_u8(np.asarray(maps_f)[:, :, ::-1]) > threshold)
    inter = (masks & masks_f).sum(axis=(1, 2))
    union = (masks | masks_f).sum(axis=(1, 2))
    per = np.where(union > 0, inter / np.maximum(union, 1), 1.0)
    out["flip_consistency"] = round(float(per[pos].mean() if pos.any() else 0.0), 4)

    # deletion drop: erase the CAM support with the frame mean color
    fill = f32.mean(axis=(1, 2), keepdims=True)
    erased = np.where(masks[..., None], fill, f32)
    p_del = np.asarray(critic_apply(critic, jnp.asarray(erased)))[:, 0]
    if pos.any():
        out["deletion_drop"] = round(float((preds[pos] - p_del[pos]).mean()), 4)
    else:
        out["deletion_drop"] = 0.0

    # tap liveness: block-1 post-pool channel variance over the episode
    from critic_vae_tpu.models.critic import critic_apply as _ca
    _, embeds = _ca(critic, jnp.asarray(f32[:256]), collect=True)
    a = np.asarray(embeds[block])  # (B, h, w, C)
    ch_std = a.std(axis=(0, 1, 2))
    out["tap_liveness"] = round(float((ch_std > 1e-3 * max(ch_std.max(), 1e-9)).mean()), 4)
    out["tap_dead_channels"] = int((ch_std <= 1e-6).sum())

    # concentration: mean fraction of CAM mass in the top-5% pixels
    flat = maps.reshape(len(maps), -1)
    k = max(1, flat.shape[1] // 20)
    part = np.partition(flat, -k, axis=1)[:, -k:]
    tot = flat.sum(axis=1)
    out["cam_top5_mass"] = round(
        float((part.sum(axis=1)[pos] / np.maximum(tot[pos], 1e-9)).mean()
              if pos.any() else 1.0), 4)
    return out, preds, maps


def main(out_path="/tmp/cam_health.json", *seeds):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from critic_vae_tpu.data.synthetic import generate_frames
    from critic_vae_tpu.models.critic import load_critic, save_critic
    from critic_vae_tpu.train.critic import (critic_accuracy,
                                             labels_from_masks, train_critic)

    seeds = [int(s) for s in seeds] or [0, 1, 2]
    os.makedirs(CACHE, exist_ok=True)
    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    ep_frames, ep_gt = generate_frames(550, seed=9999)
    hold_f, hold_g = generate_frames(2048, seed=31337)
    hold_y = labels_from_masks(hold_g)

    results = {}

    def evaluate(name, critic):
        r = {"holdout_acc": round(critic_accuracy(critic, hold_f, hold_y), 4)}
        for block in range(4):
            _, maps = cam_maps(critic, ep_frames, block)
            v, t = thr_iou_sweep(maps, ep_gt)
            r[f"block{block}_thr_iou"] = {"iou": round(v, 4), "at": t}
            print(f"  [{name}] block{block}: IoU {v:.4f} @ {t}", flush=True)
        h, _, _ = health_metrics(critic, ep_frames)
        r["health"] = h
        print(f"  [{name}] health: {h}", flush=True)
        results[name] = r
        with open(out_path, "w") as f:
            json.dump(results, f, indent=2)

    bundled = load_critic(os.path.join(REPO, "saved-networks",
                                       "critic-synthetic.npz"))
    print("[bundled]", flush=True)
    evaluate("bundled", bundled)

    cf, cg = generate_frames(12800, seed=0)
    cy = labels_from_masks(cg)
    for s in seeds:
        path = os.path.join(CACHE, f"critic-s{s}.npz")
        if os.path.exists(path):
            critic = load_critic(path)
            print(f"[seed {s}] cached", flush=True)
        else:
            print(f"[seed {s}] training (ablations recipe)...", flush=True)
            critic, loss = train_critic(cf, cy, epochs=15, batch_size=128,
                                        seed=s, progress=False)
            save_critic(path, critic)
            print(f"[seed {s}] final loss {loss:.4f}", flush=True)
        evaluate(f"seed{s}", critic)

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main(*sys.argv[1:])
