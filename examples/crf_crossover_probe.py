"""CRF backend crossover: host permutohedral lattice vs exact device
mean-field at {64², 128², 256²} (round 4, VERDICT r3 #8).

Random frames + square masks, 64-frame stacks, reference CRF params.
The device backend is skipped at 256² (its per-frame N×N pairwise matrix
would be ~8.6 GB — crf/policy.py hard-errors there by design).
Writes /tmp/crf_crossover.json; table goes into docs/DESIGN.md.
"""

import json
import os
import time

import numpy as np


def main() -> None:
    import jax

    cache = os.path.expanduser("~/.cache/critic_vae_tpu/jax")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from critic_vae_tpu.crf import refine_masks
    from critic_vae_tpu.crf.device import refine_masks_device
    from critic_vae_tpu.crf.policy import DEVICE_MAX_PIXELS

    results = {"frames": 64}
    rng = np.random.default_rng(0)
    for hw in (64, 128, 256):
        n = 64
        frames = rng.integers(0, 256, (n, hw, hw, 3), np.uint8)
        masks = np.zeros((n, hw, hw), bool)
        q = hw // 4
        masks[:, q : 3 * q, q : 3 * q] = True
        # flip some pixels so the mean-field has real work
        noise = rng.random((n, hw, hw)) < 0.05
        masks = masks ^ noise

        t0 = time.time()
        host_out = refine_masks(frames, masks)
        host_s = time.time() - t0
        results[f"host_{hw}"] = {
            "s": round(host_s, 2),
            "frames_per_s": round(n / host_s, 1),
        }
        print(f"host_{hw}", results[f"host_{hw}"], flush=True)

        if hw * hw <= DEVICE_MAX_PIXELS:
            # warm-up compile on 8 frames first, then timed run
            refine_masks_device(frames[:8], masks[:8])
            t0 = time.time()
            dev_out = refine_masks_device(frames, masks)
            dev_s = time.time() - t0
            results[f"device_{hw}"] = {
                "s": round(dev_s, 2),
                "frames_per_s": round(n / dev_s, 1),
                "agree_vs_host": round(float((dev_out == host_out).mean()), 4),
            }
            print(f"device_{hw}", results[f"device_{hw}"], flush=True)

    with open("/tmp/crf_crossover.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
