"""At-scale second-VAE experiment (round 5, VERDICT r4 #5).

The reference's ``-dataset → -second → -evalsecond`` chain trains a SECOND
VAE on the first VAE's reconstructions (reference: vae.py:130-153,
vae_utility.py:416-443) and its README calls the experiment unsuccessful
(README.md:39,48: the second VAE "did not manage to reconstruct the
reconstructions well"). The framework's chain is CLI-tested at toy scale
(tests/test_cli.py); this records ONE run at the ablation scale — ≥20k
recon frames, 7 epochs — so capability match has a measured artifact:

* VAE-1: reference config on 20k balanced synthetic frames;
* recon dataset: 20k frames via the balanced sampler in recon mode
  (recon@pred for high-critic frames, recon@0 low, both mid);
* VAE-2: same config on the recon dataset;
* report: loss curves (any instability/NaN), held-out MS-SSIM recon quality
  of each VAE on its OWN input distribution and on the other's, and the
  faithful mask-path thr-IoU of both on the three held-out episode seeds —
  does the reference's "worse on recons" finding reproduce?

Run: PYTHONPATH=/root/repo:/root/.axon_site python examples/second_vae_experiment.py [out.json]
Results: docs/artifacts/second_vae.json, docs/RESULTS.md round 5.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _recon_quality(params, bn, frames_u8):
    """Mean MS-SSIM (faithful variant) of recon@pred vs input on a batch."""
    import jax
    import jax.numpy as jnp

    from critic_vae_tpu.models import vae as vae_mod
    from critic_vae_tpu.ops.msssim import msssim_loss

    x = jnp.asarray(frames_u8[:256].astype(np.float32) / 255.0)
    mu, _, _ = vae_mod.encode(params, bn, x, train=False)
    recon = vae_mod.decode(params, mu, jnp.ones((len(x),), jnp.float32))
    return 1.0 - float(np.asarray(msssim_loss(recon, x, faithful=True)))


def main(out_dir="/tmp/cvt-second"):
    import jax

    cache = os.path.expanduser("~/.cache/critic_vae_tpu/jax")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from quality_ablations import mask_from_diff, model_diff  # noqa: E402

    from critic_vae_tpu.data.sampler import balanced_critic_sampler
    from critic_vae_tpu.data.synthetic import generate_frames
    from critic_vae_tpu.models.critic import load_critic
    from critic_vae_tpu.pipelines.dataset import build_recon_dataset
    from critic_vae_tpu.pipelines.train import train

    os.makedirs(out_dir, exist_ok=True)
    t0 = time.time()
    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    critic = load_critic(os.path.join(REPO, "saved-networks",
                                      "critic-synthetic.npz"))

    def trajs(n):
        for t in range(n):
            f, _ = generate_frames(2048, seed=100 + t)
            yield f"synth-{t}", f.astype(np.float32) / 255.0

    dset = balanced_critic_sampler(trajs(16), critic, total_images=20000)
    print(f"collected {len(dset)} frames", flush=True)

    losses = {}

    def train_one(tag, data, seed=0):
        t1 = time.time()
        log_dir = os.path.join(out_dir, f"log-{tag}")
        state = train(
            critic, data, epochs=7, batch_size=128, seed=seed,
            log_dir=log_dir, checkpoint_dir=None, resume=False,
            progress=False,
        )
        params = jax.device_get(state.params)
        bn = jax.device_get(state.bn_state)
        # loss curve from the JSONL metric mirror (io/events.py): the
        # instability question is "does the loss diverge/NaN on recons?"
        curve = []
        jl = os.path.join(log_dir, "metrics.jsonl")
        if os.path.exists(jl):
            for line in open(jl):
                rec = json.loads(line)
                if "total_loss" in rec:
                    curve.append((rec["step"], round(rec["total_loss"], 4)))
        losses[tag] = {
            "wall_s": round(time.time() - t1, 1),
            "loss_first": curve[0] if curve else None,
            "loss_last": curve[-1] if curve else None,
            "loss_max_after_first_epoch": (
                round(max(v for s, v in curve[len(curve) // 7:]), 4)
                if len(curve) > 7 else None),
            "loss_curve_every_10th": [c for i, c in enumerate(curve)
                                      if i % 10 == 0],
            "nan_in_curve": any(np.isnan(v) for _, v in curve),
        }
        return params, bn

    print("training VAE-1 (reference config, 7 epochs)...", flush=True)
    p1, bn1 = train_one("vae1", dset)

    print("building recon dataset...", flush=True)
    t1 = time.time()
    # 64 trajectories: the recon-mode bins (150/bin/traj caps,
    # data/sampler.py) ran dry at 9,600 of the 20k target over 16 — the
    # at-scale requirement is ≥20k recon frames (VERDICT r4 #5)
    recon_dset = build_recon_dataset(
        trajs(64), critic, p1, bn1, total_images=20000)
    print(f"recon dataset: {len(recon_dset)} frames, "
          f"{time.time() - t1:.0f}s", flush=True)

    print("training VAE-2 on reconstructions (7 epochs)...", flush=True)
    p2, bn2 = train_one("vae2", recon_dset)

    # evaluation
    results = {"recon_dataset_frames": int(len(recon_dset)),
               "train": losses}
    hold, _ = generate_frames(256, seed=31337)
    recon_hold = (np.clip(recon_dset[:256], 0, 1) * 255).astype(np.uint8) \
        if recon_dset.dtype != np.uint8 else recon_dset[:256]
    results["msssim"] = {
        "vae1_on_frames": round(_recon_quality(p1, bn1, hold), 4),
        "vae2_on_frames": round(_recon_quality(p2, bn2, hold), 4),
        "vae1_on_recons": round(_recon_quality(p1, bn1, recon_hold), 4),
        "vae2_on_recons": round(_recon_quality(p2, bn2, recon_hold), 4),
    }
    print("msssim:", results["msssim"], flush=True)

    results["mask_iou"] = {}
    for s in (9999, 4242, 777):
        fr, gt = generate_frames(550, seed=s)
        per = {}
        for tag, (p, bn) in (("vae1", (p1, bn1)), ("vae2", (p2, bn2))):
            diff, maxv = model_diff(p, bn, critic, fr)
            per[tag] = mask_from_diff(diff, maxv, gt, crf_frames=fr)
        results["mask_iou"][str(s)] = per
        print(f"seed {s}: {per}", flush=True)

    results["wall_seconds"] = round(time.time() - t0, 1)
    with open(os.path.join(out_dir, "second_vae.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main(*sys.argv[1:])
