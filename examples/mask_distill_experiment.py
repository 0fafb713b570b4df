"""Self-distillation of the faithful mask path (round 4, VERDICT r3 #3).

Can the framework's own best masks — LayerCAM saliency + CAM-tuned CRF,
IoU ≈ 0.79–0.81 (docs/RESULTS.md) — supervise the decoder's
value-conditioning pathway past the measured ~0.10–0.115 recon-diff
ceiling? Pseudo-labels are built for the TRAINING set from the frozen
critic alone (pipelines/distill.py — zero ground truth), and the opt-in
``mask_distill`` Dice term (train/step.py) pushes the double-decode diff
signal into their support. Evaluation: faithful recon-diff best-threshold
IoU on three held-out synthetic episodes (seeds 9999/4242/777), identical
machinery to the round-2/3 ablations (examples/quality_ablations.py).

Run: python examples/mask_distill_experiment.py [out_dir] [weights...]
(expects a TPU; writes mask_distill.json). Results: docs/RESULTS.md.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from quality_ablations import mask_from_diff, model_diff  # noqa: E402


def main(out_dir="/tmp/cvt-md", *weights):
    import jax

    cache = os.path.expanduser("~/.cache/critic_vae_tpu/jax")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from critic_vae_tpu.data.sampler import balanced_critic_sampler
    from critic_vae_tpu.data.synthetic import generate_frames
    from critic_vae_tpu.ops.iou import iou
    from critic_vae_tpu.pipelines.distill import build_pseudo_masks
    from critic_vae_tpu.pipelines.train import train

    weights = [float(w) for w in weights] or [0.0, 0.1, 0.3, 1.0]
    os.makedirs(out_dir, exist_ok=True)
    t0 = time.time()

    episodes = {s: generate_frames(550, seed=s) for s in (9999, 4242, 777)}

    # The bundled CAM-validated critic (same one the saliency/CRF-tuning
    # experiments measured 0.52 thr / 0.79-0.81 CRF IoU with; its LayerCAM
    # behavior is golden-pinned in tests/test_golden_saliency.py). The first
    # round-4 run trained a FRESH critic here with the ablations' recipe —
    # it classified fine but its LayerCAM localization collapsed
    # (pseudo-label IoU 0.006 vs 0.52, positive fraction 0.019 vs 0.067):
    # CAM quality is critic-instance-dependent, so distilling from an
    # unvalidated critic tests nothing. docs/RESULTS.md records both runs.
    from critic_vae_tpu.models.critic import load_critic

    critic_params = load_critic(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "saved-networks", "critic-synthetic.npz"))

    def trajs():
        for t in range(16):
            f, _ = generate_frames(2048, seed=100 + t)
            yield f"synth-{t}", f.astype(np.float32) / 255.0

    dset = balanced_critic_sampler(trajs(), critic_params, total_images=20000)
    print(f"collected {len(dset)} frames", flush=True)

    print("building pseudo-labels (LayerCAM + CAM-tuned device CRF)...", flush=True)
    t_pm = time.time()
    pm = build_pseudo_masks(
        critic_params, dset, crf_backend="auto", batch_size=512,
    )
    print(
        f"pseudo-masks: {pm.mean():.4f} positive fraction, "
        f"{time.time() - t_pm:.0f}s", flush=True,
    )
    # sanity: pseudo-label quality vs GT on a held-out episode (reported,
    # never used in training)
    ep_f, ep_gt = episodes[9999]
    pm_ep = build_pseudo_masks(critic_params, ep_f, crf_backend="auto")
    pseudo_quality = round(iou(ep_gt, pm_ep), 3)
    print(f"pseudo-label IoU vs GT (held-out ep): {pseudo_quality}", flush=True)

    results = {"pseudo_label_iou_ep9999": pseudo_quality,
               "pseudo_positive_fraction": round(float(pm.mean()), 4)}
    for w in weights:
        print(f"[md={w}] training 7 epochs...", flush=True)
        state = train(
            critic_params, dset, epochs=7, batch_size=128,
            mask_distill=w, pseudo_masks=pm if w > 0 else None,
            log_dir=None, checkpoint_dir=None, resume=False, progress=False,
        )
        params = jax.device_get(state.params)
        bn = jax.device_get(state.bn_state)
        per_seed = {}
        for s, (fr, gt) in episodes.items():
            diff, maxv = model_diff(params, bn, critic_params, fr)
            per_seed[str(s)] = mask_from_diff(diff, maxv, gt, crf_frames=fr)
            print(f"    md={w} seed={s}: {per_seed[str(s)]}", flush=True)
        results[f"md_{w}"] = per_seed

    results["wall_seconds"] = round(time.time() - t0, 1)
    with open(os.path.join(out_dir, "mask_distill.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main(*sys.argv[1:])
