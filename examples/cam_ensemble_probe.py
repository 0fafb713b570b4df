"""Does ensembling the top-k health-ranked candidates close the selection
gap? (round 5, VERDICT r4 #1 — follow-up to cam_select_probe.py.)

cam_select_probe measured single-instance best-of-6 selection on three
independent pools: pool 0 PASSES the acceptance bar (chain within 0.05 of
the bundled 0.58/0.84), pools 100/200 miss it marginally (thr 0.47/0.53,
CRF 0.75/0.80) — ``deletion_drop`` ranks instances correctly *within* a
pool, but the absolute del→chain mapping is noisy, so one selected
instance is not reliably enough.

Hypothesis: LayerCAM instance noise is largely uncorrelated across
training seeds, while the trunk signal is shared — so MEAN-combining the
per-critic (episode-normalized) TTA CAM maps of the top-k candidates
should beat any single instance, using critics the selection run already
trained (zero extra training cost).

Per pool and k ∈ {1, 2, 3}: each critic's full TTA product map
(LayerCAM + {id,mirror}×{0,±2}, the `--quality` stage) is fetched per
episode, normalized by ITS OWN episode mean-max (the chain's
normalization — this puts different critics' CAM magnitudes on one
scale), averaged across the k critics, thresholded at {64, 80, 96}, and
CRF-refined with the CAM-tuned params. Acceptance unchanged: thr ≥ 0.53
and CRF ≥ 0.79 on all three episode seeds.

Run: PYTHONPATH=/root/repo:/root/.axon_site python examples/cam_ensemble_probe.py [out.json]
Results: docs/artifacts/cam_ensemble.json, docs/RESULTS.md round 5.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CACHE = "/tmp/cvt-critics-r5"
TUNED = (132.0, 32.0, 3.1, 8.0, 1.8, 10)
SELECT_JSON = "/tmp/cam_select.json"
THRESHOLDS = (64, 80, 96)


def main(out_path="/tmp/cam_ensemble.json"):
    import jax

    cache = os.path.expanduser("~/.cache/critic_vae_tpu/jax")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from critic_vae_tpu.crf import refine_masks
    from critic_vae_tpu.data.synthetic import generate_frames
    from critic_vae_tpu.models.critic import load_critic
    from critic_vae_tpu.models.vae import init_vae_params
    from critic_vae_tpu.ops.iou import iou
    from critic_vae_tpu.ops.mask import normalize_diffs_given_mean
    from critic_vae_tpu.pipelines.video import episode_device_stage

    sel = json.load(open(SELECT_JSON))
    params, bn = init_vae_params(jax.random.key(0))
    episodes = {s: generate_frames(550, seed=s) for s in (9999, 4242, 777)}
    sal = {"method": "layercam", "tta_flip": True, "tta_shift": 2}

    t0 = time.time()
    results = {"thresholds": list(THRESHOLDS), "pools": {}}

    for base, pool in sel["pools"].items():
        ranked = sorted(pool["candidates"],
                        key=lambda c: -c["deletion_drop"])
        res_pool = {"ranked_seeds": [c["seed"] for c in ranked[:3]]}
        # per-critic normalized TTA maps, per episode (computed once, k reuses)
        maps = {}  # (seed, ep) -> (N, H, W) float u8-scale
        for c in ranked[:3]:
            critic = load_critic(
                os.path.join(CACHE, f"critic-soft15_s{c['seed']}.npz"))
            for es, (frames, _) in episodes.items():
                out = episode_device_stage(
                    params, bn, critic, frames, 128, with_recons=False,
                    mask_source="saliency", saliency_opts=sal)
                m = out["diff"]
                mean_max = float(np.mean(m.max(axis=(1, 2))))
                maps[(c["seed"], es)] = np.asarray(normalize_diffs_given_mean(
                    jnp.asarray(m), np.float32(mean_max))).astype(np.float32)
            print(f"[pool {base}] maps for seed {c['seed']} done", flush=True)
        for k in (1, 2, 3):
            chain = {}
            for es, (frames, gt) in episodes.items():
                ens = np.mean([maps[(c["seed"], es)] for c in ranked[:k]],
                              axis=0)
                best_thr = best_crf = 0.0
                for t in THRESHOLDS:
                    masks = ens > t
                    best_thr = max(best_thr, iou(gt, masks))
                    best_crf = max(best_crf, iou(gt, refine_masks(
                        frames, masks, TUNED)))
                chain[str(es)] = {"thr_iou": round(float(best_thr), 4),
                                  "crf_iou": round(float(best_crf), 4)}
            ok = all(v["thr_iou"] >= 0.53 and v["crf_iou"] >= 0.79
                     for v in chain.values())
            res_pool[f"top{k}"] = {"chain": chain, "pass": ok}
            print(f"[pool {base}] top-{k}: {json.dumps(chain)} PASS={ok}",
                  flush=True)
        results["pools"][base] = res_pool
        with open(out_path, "w") as f:
            json.dump(results, f, indent=2)

    for k in (1, 2, 3):
        results[f"all_pools_pass_top{k}"] = all(
            p[f"top{k}"]["pass"] for p in results["pools"].values())
    results["wall_seconds"] = round(time.time() - t0, 1)
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", out_path, {k: results[f"all_pools_pass_top{k}"]
                              for k in (1, 2, 3)})


if __name__ == "__main__":
    main(*sys.argv[1:])
