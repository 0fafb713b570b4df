"""Value-consistency ablation: can the auxiliary loss lift the quality ceiling?

The round-2 ablations (examples/quality_ablations.py, docs/RESULTS.md)
isolated the limiter at thr-IoU ≈ 0.10: the decoder's learned
value-conditioning pathway — oracle critic values move nothing, 4× data buys
+0.003. This experiment trains at the 1× data point with the round-3
critic-grounded value-consistency term (train/step.py: the frozen critic
must read decode(mu, 0) as trunk-free and decode(mu, v) as probability v)
over a weight sweep, and evaluates best-threshold IoU on the same held-out
550-frame synthetic episode.

Run: python examples/value_consistency_experiment.py [out_dir] [weights...]
(expects a TPU; writes value_consistency.json). Results: docs/RESULTS.md.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from quality_ablations import mask_from_diff, model_diff  # noqa: E402


def main(out_dir="/tmp/cvt-vc", *weights):
    import jax

    cache = os.path.expanduser("~/.cache/critic_vae_tpu/jax")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from critic_vae_tpu.data.sampler import balanced_critic_sampler
    from critic_vae_tpu.data.synthetic import generate_frames
    from critic_vae_tpu.pipelines.train import train
    from critic_vae_tpu.train.critic import labels_from_masks, train_critic

    weights = [float(w) for w in weights] or [0.0, 0.03, 0.1, 0.3]
    os.makedirs(out_dir, exist_ok=True)
    t0 = time.time()

    # identical setup to quality_ablations' 1x point
    ep_frames, ep_gt = generate_frames(550, seed=9999)
    print("training critic (12800 frames, 15 epochs)...", flush=True)
    cf, cg = generate_frames(12800, seed=0)
    critic_params, _ = train_critic(
        cf, labels_from_masks(cg), epochs=15, batch_size=128,
        dropout_rate=0.3, progress=False,
    )

    def trajs():
        for t in range(16):
            f, _ = generate_frames(2048, seed=100 + t)
            yield f"synth-{t}", f.astype(np.float32) / 255.0

    dset = balanced_critic_sampler(trajs(), critic_params, total_images=20000)
    print(f"collected {len(dset)} frames", flush=True)

    results = {}
    for w in weights:
        print(f"[vc={w}] training 7 epochs...", flush=True)
        state = train(
            critic_params, dset, epochs=7, batch_size=128,
            value_consistency=w,
            log_dir=None, checkpoint_dir=None, resume=False, progress=False,
        )
        params = jax.device_get(state.params)
        bn = jax.device_get(state.bn_state)
        diff, maxv = model_diff(params, bn, critic_params, ep_frames)
        results[f"vc_{w}"] = mask_from_diff(diff, maxv, ep_gt,
                                            crf_frames=ep_frames)
        print(f"    vc={w}: {results[f'vc_{w}']}", flush=True)

    results["wall_seconds"] = round(time.time() - t0, 1)
    with open(os.path.join(out_dir, "value_consistency.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))
    return results


if __name__ == "__main__":
    main(*sys.argv[1:])
