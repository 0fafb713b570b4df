"""Host-lattice vs device-exact CRF crossover measurement (VERDICT r3 #8).

The two backends scale oppositely with resolution: the C++ permutohedral
lattice (crf/densecrf.cpp) is O(N) per frame on the host CPU; the exact
device mean-field (crf/device.py) is O(N²) in pixels but rides the MXU —
measured ~6× the lattice at the pipeline's native 64². This probe times
both at {64², 128², 256²} on synthetic frames (256² device is rejected by
policy — its per-frame bf16 pairwise matrix alone would be ~8.6 GB) and
writes the crossover table quoted in docs/DESIGN.md ("CRF backend
crossover"). crf/policy.py::resolve_crf_backend encodes the resulting
dispatch; reference anchor: the lattice approximation exists precisely for
large N (vae_utility.py:22-54).

Run: python examples/crf_crossover_probe.py [out.json]
(expects the TPU for the device rows; host rows run anywhere).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(out_path="/tmp/crf_crossover.json"):
    import jax

    cache = os.path.expanduser("~/.cache/critic_vae_tpu/jax")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from critic_vae_tpu.crf import REFERENCE_CRF_PARAMS, refine_masks
    from critic_vae_tpu.crf.device import refine_masks_device
    from critic_vae_tpu.crf.policy import DEVICE_MAX_PIXELS
    from critic_vae_tpu.data.synthetic import generate_frames

    res = {"params": list(REFERENCE_CRF_PARAMS),
           "platform": jax.default_backend()}
    for size in (64, 128, 256):
        # mask quality does not affect timing; GT trunks are plausible masks
        n = 64 if size == 64 else (16 if size == 128 else 8)
        frames, gt = generate_frames(n, size=size, seed=1)
        row = {"frames": n}

        t0 = time.time()
        host_out = refine_masks(frames, gt, REFERENCE_CRF_PARAMS, 0)
        warm = time.time() - t0
        t0 = time.time()
        host_out = refine_masks(frames, gt, REFERENCE_CRF_PARAMS, 0)
        dt = time.time() - t0
        row["host_ms_per_frame"] = round(1e3 * dt / n, 2)
        row["host_frames_per_sec"] = round(n / dt, 1)
        row["host_warm_build_s"] = round(warm, 2)
        print(f"{size}²: host {row['host_ms_per_frame']} ms/frame", flush=True)

        if size * size <= DEVICE_MAX_PIXELS and jax.default_backend() != "cpu":
            dev_out = refine_masks_device(frames, gt, REFERENCE_CRF_PARAMS)
            t0 = time.time()
            dev_out = refine_masks_device(frames, gt, REFERENCE_CRF_PARAMS)
            dt = time.time() - t0
            row["device_ms_per_frame"] = round(1e3 * dt / n, 2)
            row["device_frames_per_sec"] = round(n / dt, 1)
            # the two backends solve the same model by different algorithms
            # (exact vs lattice approximation) — report agreement, not a pin
            row["mask_agreement"] = round(
                float((dev_out == host_out).mean()), 4)
            print(f"{size}²: device {row['device_ms_per_frame']} ms/frame "
                  f"(agree {row['mask_agreement']})", flush=True)
        else:
            row["device"] = (
                "policy-rejected: exact O(N²) pairwise matrix "
                f"~{2 * (size * size) ** 2 / 1e9:.1f} GB/frame"
                if size * size > DEVICE_MAX_PIXELS else "no accelerator"
            )
        res[f"{size}x{size}"] = row

    with open(out_path, "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    main(*sys.argv[1:])
