"""Validate the best-of-N critic selection recipe end-to-end
(round 5, VERDICT r4 #1 acceptance run).

The recipe under test is exactly what ships (`traincritic --labels soft
--cam-select N`, train/critic.py::train_critic_selected): train N
candidate critics with soft trunk-area labels and keep the one with the
highest NO-ground-truth ``deletion_drop`` CAM-health metric
(train/critic.py::critic_cam_health). This probe runs THREE independent
pools (base seeds 0 / 100 / 200, 6 candidates each — recording every
candidate's health so the artifact also shows what smaller N would have
selected), then runs the full `--quality` TTA chain (LayerCAM +
{id,mirror}x{0,±2} product + CAM-tuned CRF) for each pool's selected
critic on the three held-out episode seeds.

Acceptance (VERDICT r4 #1): every selected critic's chain within 0.05 of
the bundled critic's (thr-IoU 0.58 / CRF-IoU 0.84), i.e. thr >= 0.53 and
CRF >= 0.79 on all three episode seeds.

Prior evidence (docs/artifacts/cam_recipe.json): pool-0 candidates s0/s1/s2
have deletion_drop {0.31, 0.34, 0.68} and chains {0.48/0.84, 0.45/0.66,
0.61/0.91} — argmax-del picks the winner; this probe tests whether that
generalizes to fresh pools.

Run: PYTHONPATH=/root/repo:/root/.axon_site python examples/cam_select_probe.py [out.json]
Results: docs/artifacts/cam_select_validation.json, docs/RESULTS.md round 5.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cam_recipe_probe import tta_chain_eval  # noqa: E402

CACHE = "/tmp/cvt-critics-r5"
POOLS = (0, 100, 200)
CANDIDATES = 6
BUNDLED_CHAIN = {"thr_iou": 0.58, "crf_iou": 0.84}
MARGIN = 0.05


def main(out_path="/tmp/cam_select.json"):
    import jax

    cache = os.path.expanduser("~/.cache/critic_vae_tpu/jax")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import numpy as np

    from critic_vae_tpu.data.synthetic import generate_frames
    from critic_vae_tpu.models.critic import load_critic, save_critic
    from critic_vae_tpu.train.critic import (critic_accuracy,
                                             critic_cam_health,
                                             labels_from_masks,
                                             soft_trunk_labels, train_critic)

    os.makedirs(CACHE, exist_ok=True)
    t0 = time.time()

    cf, cg = generate_frames(12800, seed=0)
    y_soft = soft_trunk_labels(cg)
    hold_f, hold_g = generate_frames(2048, seed=31337)
    hold_y = labels_from_masks(hold_g)
    ep_frames, _ = generate_frames(550, seed=9999)  # health frames
    episodes = {s: generate_frames(550, seed=s) for s in (9999, 4242, 777)}

    results = {"recipe": "soft p90 labels, 15 epochs, best-of-N by "
                         "deletion_drop (train_critic_selected)",
               "pools": {}, "bundled_chain": BUNDLED_CHAIN,
               "margin": MARGIN}

    for base in POOLS:
        pool = {"candidates": []}
        best = None
        for c in range(CANDIDATES):
            seed = base + c
            path = os.path.join(CACHE, f"critic-soft15_s{seed}.npz")
            if os.path.exists(path):
                critic = load_critic(path)
            else:
                print(f"[pool {base}] training seed {seed}...", flush=True)
                critic, _ = train_critic(cf, y_soft, epochs=15,
                                         batch_size=128, seed=seed,
                                         progress=False)
                save_critic(path, critic)
            h = critic_cam_health(critic, ep_frames)
            h["seed"] = seed
            h["holdout_acc"] = round(critic_accuracy(critic, hold_f, hold_y), 4)
            pool["candidates"].append(
                {k: (round(v, 4) if isinstance(v, float) else v)
                 for k, v in h.items()})
            print(f"  seed {seed}: del={h['deletion_drop']:.3f} "
                  f"acc={h['holdout_acc']}", flush=True)
            if best is None or h["deletion_drop"] > best[1]:
                best = (critic, h["deletion_drop"], seed)
        pool["selected_seed"] = best[2]
        pool["selected_deletion_drop"] = round(best[1], 4)
        # what would N=2..6 have selected? (prefix argmax)
        dels = [c["deletion_drop"] for c in pool["candidates"]]
        pool["prefix_selection"] = {
            str(n): pool["candidates"][int(np.argmax(dels[:n]))]["seed"]
            for n in range(2, CANDIDATES + 1)}
        print(f"[pool {base}] selected seed {best[2]} "
              f"(del={best[1]:.3f}); chain:", flush=True)
        pool["chain"] = tta_chain_eval(best[0], episodes)
        pool["pass"] = all(
            v["thr_iou"] >= BUNDLED_CHAIN["thr_iou"] - MARGIN
            and v["crf_iou"] >= BUNDLED_CHAIN["crf_iou"] - MARGIN
            for v in pool["chain"].values())
        print(f"[pool {base}] PASS={pool['pass']}", flush=True)
        results["pools"][str(base)] = pool
        with open(out_path, "w") as f:
            json.dump(results, f, indent=2)

    results["all_pools_pass"] = all(
        p["pass"] for p in results["pools"].values())
    results["wall_seconds"] = round(time.time() - t0, 1)
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", out_path, "all_pools_pass =",
          results["all_pools_pass"])


if __name__ == "__main__":
    main(*sys.argv[1:])
