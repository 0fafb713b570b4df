"""Measure the round-5 overlapped CRF-enabled end-to-end pipeline
(VERDICT r4 #2: dispatch/fetch/CRF overlap + bit-packed mask fetches).

Round 3 measured `eval_episode` + device CRF on 2048 frames at **346 f/s,
fetch-bound** (5.9 s wall — docs/RESULTS.md): the device stage dispatched a
chunk then blocked on its fetch, the CRF waited for every mask fetch, and
boolean masks crossed the ~13 MB/s tunnel at 1 byte/pixel. Round 5:

* `episode_device_stage` double-buffers (dispatch chunk k+1 before fetching
  chunk k; HBM residency bounded at prefetch+1 chunks);
* `eval_episode` dispatches every normalize/threshold program and the
  device-CRF mean-field BEFORE any bulk fetch (async dispatch ⇒ the
  mean-field computes while uint8 diffs stream out), or runs the host CRF
  per chunk on a consumer thread (ctypes drops the GIL);
* thr/CRF masks fetch as packed bits (8× fewer bytes,
  ops/mask.py::pack_mask_bits).

Acceptance (VERDICT): ≥2× the round-3 346 f/s on the real chip, plus an
equivalence check (overlapped == serial results, also pinned CPU-side in
tests/test_pipelines.py).

Run: PYTHONPATH=/root/repo:/root/.axon_site python examples/e2e_overlap_probe.py [out.json]
Results: docs/artifacts/e2e_overlap.json, docs/DESIGN.md round 5.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(out_path="/tmp/e2e_overlap.json"):
    import jax

    cache = os.path.expanduser("~/.cache/critic_vae_tpu/jax")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    from critic_vae_tpu.data.synthetic import generate_frames
    from critic_vae_tpu.models.critic import load_critic
    from critic_vae_tpu.models.vae import init_vae_params
    from critic_vae_tpu.pipelines.video import eval_episode

    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    critic = load_critic(os.path.join(REPO, "saved-networks",
                                      "critic-synthetic.npz"))
    vae_params, bn_state = init_vae_params(jax.random.key(0))
    frames, gt = generate_frames(2048, seed=0)

    res = {"platform": jax.default_backend(),
           "round3_baseline_fps": 346.0}
    kw = dict(threshold=50, run_crf=True, with_recons=False, batch_size=512)

    for backend in ("device", "host"):
        # warm / compile
        eval_episode(vae_params, bn_state, critic, frames[:512], gt[:512],
                     crf_backend=backend, **kw)
        runs = []
        r = None
        for _ in range(3):
            t0 = time.perf_counter()
            r = eval_episode(vae_params, bn_state, critic, frames, gt,
                             crf_backend=backend, **kw)
            runs.append(2048 / (time.perf_counter() - t0))
        res[backend] = {
            "fps_median": round(float(np.median(runs)), 1),
            "fps_runs": [round(x, 1) for x in runs],
            "thr_iou": round(float(r.thr_iou), 4),
            "crf_iou": round(float(r.crf_iou), 4),
            "vs_round3": round(float(np.median(runs)) / 346.0, 2),
        }
        print(backend, res[backend], flush=True)

    # with recons (the panel-producing path, uint8 recons)
    eval_episode(vae_params, bn_state, critic, frames[:512], gt[:512],
                 crf_backend="device", threshold=50, run_crf=True,
                 with_recons=True, recons_u8=True, batch_size=512)
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        eval_episode(vae_params, bn_state, critic, frames, gt,
                     crf_backend="device", threshold=50, run_crf=True,
                     with_recons=True, recons_u8=True, batch_size=512)
        runs.append(2048 / (time.perf_counter() - t0))
    res["device_with_recons_u8"] = {
        "fps_median": round(float(np.median(runs)), 1),
        "fps_runs": [round(x, 1) for x in runs],
    }
    print("with_recons_u8", res["device_with_recons_u8"], flush=True)

    with open(out_path, "w") as f:
        json.dump(res, f, indent=2)
    print("wrote", out_path)


if __name__ == "__main__":
    main(*sys.argv[1:])
