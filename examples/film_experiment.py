"""FiLM conditioning ablation: does widening the value pathway lift the ceiling?

The round-2 ablations isolated the mask-quality limiter at the decoder's
value-conditioning pathway, and the round-3 value-consistency loss alone
moved it only +0.002 (docs/RESULTS.md) — consistent with the pathway's
*capacity* being the bottleneck: the reference architecture conditions on
one scalar concatenated onto the 32-d latent (vae_nets.py:137,143), a
33rd input to a single linear layer. The opt-in FiLM pathway
(models/vae.py, ``train --film``) gives every decoder stage a learned
per-channel (gamma, beta) response to the value.

This experiment trains {plain, film, film+vc} at the 1× data point and
evaluates best-threshold IoU on the same held-out 550-frame synthetic
episode as the round-2 ablations.

Run: python examples/film_experiment.py [out_dir] [configs...]
where configs are "film", "film+vc0.1", "vc0.1", "plain", ...
(expects a TPU; writes film_experiment.json). Results: docs/RESULTS.md.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from quality_ablations import mask_from_diff, model_diff  # noqa: E402


def parse(cfg: str):
    """"film+vc0.1+kld0.01+seed3+ep14" → (film=True, vc=0.1, kld=0.01,
    seed=3, epochs=14). The kld token probes the information-bottleneck
    lever: the injected value is KL-free while the latent pays
    kld_weight·KL, so squeezing z harder should force the decoder to lean
    on the value pathway the masks feed on. seed/ep tokens measure run
    variance and training-length response at a fixed configuration."""
    film = False
    vc = 0.0
    kld = 1e-3  # reference default (vae_parameters.py:16)
    seed = 0
    epochs = 7
    data = 1
    for part in cfg.split("+"):
        if part == "film":
            film = True
        elif part.startswith("vc"):
            vc = float(part[2:])
        elif part.startswith("kld"):
            kld = float(part[3:])
        elif part.startswith("seed"):
            seed = int(part[4:])
        elif part.startswith("ep"):
            epochs = int(part[2:])
        elif part.startswith("data"):
            data = int(part[4:])  # multiple of the 20k-frame 1x point
        elif part != "plain":
            raise ValueError(f"unknown config token {part!r} in {cfg!r}")
    return film, vc, kld, seed, epochs, data


def main(out_dir="/tmp/cvt-film", *configs):
    import jax

    cache = os.path.expanduser("~/.cache/critic_vae_tpu/jax")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from critic_vae_tpu.data.sampler import balanced_critic_sampler
    from critic_vae_tpu.data.synthetic import generate_frames
    from critic_vae_tpu.pipelines.train import train
    from critic_vae_tpu.train.critic import labels_from_masks, train_critic

    configs = list(configs) or ["plain", "film", "film+vc0.1", "film+vc0.3"]
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

    def collect(mult):
        def trajs():
            for t in range(16 * mult):
                f, _ = generate_frames(2048, seed=100 + t)
                yield f"synth-{t}", f.astype(np.float32) / 255.0

        d = balanced_critic_sampler(
            trajs(), critic_params, total_images=20000 * mult
        )
        print(f"collected {len(d)} frames ({mult}x)", flush=True)
        return d

    dsets = {}  # data multiple -> collected set, reused across configs
    results = {}
    for cfg in configs:
        film, vc, kld, seed, epochs, data = parse(cfg)
        if data not in dsets:
            dsets[data] = collect(data)
        print(f"[{cfg}] training {epochs} epochs (film={film}, vc={vc}, "
              f"kld={kld}, seed={seed}, data={data}x)...", flush=True)
        state = train(
            critic_params, dsets[data], epochs=epochs, batch_size=128,
            film=film, value_consistency=vc, kld_weight=kld, seed=seed,
            log_dir=None, checkpoint_dir=None, resume=False, progress=False,
        )
        params = jax.device_get(state.params)
        bn = jax.device_get(state.bn_state)
        diff, maxv = model_diff(params, bn, critic_params, ep_frames)
        results[cfg] = mask_from_diff(diff, maxv, ep_gt, crf_frames=ep_frames)
        print(f"    {cfg}: {results[cfg]}", flush=True)

    results["wall_seconds"] = round(time.time() - t0, 1)
    with open(os.path.join(out_dir, "film_experiment.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))
    return results


if __name__ == "__main__":
    main(*sys.argv[1:])
