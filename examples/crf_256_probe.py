"""Device-CRF at 256²: measure the exact formulation past its 128² policy
cap (round 5, VERDICT r4 #3).

The exact device mean-field scales with the 4TH power of resolution: its
(N, N) pairwise matrix is 33.5 MB bf16 at 64², 537 MB at 128², 8.6 GB at
256². crf/policy.py hard-caps `--crf-backend device` at 128²; this probe
replaces the cap's back-of-envelope justification with a REAL measured
attempt at 256² plus the roofline arithmetic:

* build cost — 2·N² transcendentals (the bilateral + spatial exps). The
  128² crossover measurement (22.37 ms/frame, docs/artifacts/
  crf_crossover.json) implies ~3.6e10 exp/s effective, so 256² ⇒ ~240 ms
  of pure build per frame before any mean-field work;
* iteration cost — the matrix streams from HBM every iteration:
  (1 write + iters reads) × N² bytes ⇒ 94.6 GB/frame bf16 at iters=10,
  ~115 ms at the chip's ~819 GB/s;
* the host permutohedral lattice is O(N): measured 3.3 f/s at 256² on one
  core (≈300 ms/frame), so the exact device path needs < ~350 ms/frame to
  matter — i.e. it is at best at parity, with an 8.6 GB/frame HBM
  footprint that starves every co-resident tensor.

The probe times `refine_masks_device` at 256² (frame_chunk=1, raised
CRITIC_VAE_TPU_CRF_MEM, Pallas-streamed build; falls back to the XLA build
if Mosaic rejects the tiling) and records agreement vs the host lattice.
The policy cap stays/goes based on THIS artifact.

Run: PYTHONPATH=/root/repo:/root/.axon_site CRITIC_VAE_TPU_CRF_MEM=9663676416 \
       python examples/crf_256_probe.py [out.json]
Results: docs/artifacts/crf_256.json, docs/DESIGN.md round 5.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PARAMS = (22.0, 12.0, 3.1, 8.0, 1.8, 10)  # the crossover probe's params


def main(out_path="/tmp/crf_256.json"):
    os.environ.setdefault("CRITIC_VAE_TPU_CRF_MEM", str(9 * 1024**3))
    import jax

    cache = os.path.expanduser("~/.cache/critic_vae_tpu/jax")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    from critic_vae_tpu.crf import refine_masks
    from critic_vae_tpu.data.synthetic import generate_frames

    n_frames = 4
    frames, gt = generate_frames(n_frames, size=256, seed=0)
    masks = gt.copy()
    # perturb so the CRF has real work (flip a block per frame)
    masks[:, 60:90, 60:90] ^= True

    res = {"platform": jax.default_backend(), "params": PARAMS,
           "frames": n_frames, "resolution": "256x256",
           "roofline": {
               "matrix_gb_per_frame_bf16": round(
                   (256 * 256) ** 2 * 2 / 1e9, 2),
               "hbm_gb_per_frame_iters10": round(
                   (256 * 256) ** 2 * 2 * 11 / 1e9, 1),
               "build_exps_per_frame": 2 * (256 * 256) ** 2,
               "exp_rate_implied_by_128sq_measurement": 3.6e10,
               "predicted_ms_per_frame": "~355 (240 build + 115 stream)",
           }}

    # host lattice baseline (per-frame; single core on this mount)
    refine_masks(frames[:1], masks[:1], PARAMS)  # warm (lattice build cache)
    t0 = time.time()
    ref = refine_masks(frames, masks, PARAMS)
    host_s = time.time() - t0
    res["host"] = {"ms_per_frame": round(1000 * host_s / n_frames, 1),
                   "frames_per_sec": round(n_frames / host_s, 2)}
    print("host:", res["host"], flush=True)

    from critic_vae_tpu.crf.device import refine_masks_device

    for build in ("pallas", "xla"):
        tag = f"device_{build}"
        try:
            t0 = time.time()
            out = np.asarray(refine_masks_device(
                frames, masks, PARAMS, frame_chunk=1, build=build))
            cold_s = time.time() - t0
            t0 = time.time()
            out = np.asarray(refine_masks_device(
                frames, masks, PARAMS, frame_chunk=1, build=build))
            warm_s = time.time() - t0
            res[tag] = {
                "ms_per_frame": round(1000 * warm_s / n_frames, 1),
                "frames_per_sec": round(n_frames / warm_s, 2),
                "cold_s": round(cold_s, 1),
                "mask_agreement_vs_host": round(
                    float((out == ref).mean()), 4),
                "vs_host": round(host_s / warm_s, 2),
            }
            print(tag, res[tag], flush=True)
            break  # one working build is enough for the verdict
        except Exception as e:  # noqa: BLE001 — record the failure mode
            res[tag] = {"error": f"{type(e).__name__}: {str(e)[:500]}"}
            print(tag, "FAILED:", res[tag]["error"][:200], flush=True)

    with open(out_path, "w") as f:
        json.dump(res, f, indent=2)
    print("wrote", out_path)


if __name__ == "__main__":
    main(*sys.argv[1:])
