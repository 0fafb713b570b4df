"""On-chip throughput of the TTA saliency stacks (round 4).

The flip/shift TTA options multiply the saliency-stage passes (2 views
for flip, 4 for flip+shift). This probe measures what actually ships:
`episode_forward(mask_source="saliency", method="layercam")` at B=512
bf16 on the real chip, for tta ∈ {off, flip, flip+shift2}, with the
repo's timing methodology (sum-reduced barrier, warm programs, median of
reps). Numbers quoted in docs/RESULTS.md next to the IoU claims.

Run: PYTHONPATH=/root/repo:/root/.axon_site python examples/cam_tta_throughput_probe.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(out_path="/tmp/cam_tta_throughput.json"):
    import jax
    import jax.numpy as jnp

    cache = os.path.expanduser("~/.cache/critic_vae_tpu/jax")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from critic_vae_tpu.data.synthetic import generate_frames
    from critic_vae_tpu.models.critic import load_critic
    from critic_vae_tpu.models.vae import init_vae_params
    from critic_vae_tpu.ops.mask import episode_forward

    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    critic = load_critic(os.path.join(REPO, "saved-networks",
                                      "critic-synthetic.npz"))
    params, bn = init_vae_params(jax.random.key(0))

    B = 512
    frames, _ = generate_frames(B, seed=0)
    x = jnp.asarray(frames.astype(np.float32) / 255.0, jnp.bfloat16)

    def make(flip, shift):
        def fn(xb):
            out = episode_forward(
                params, bn, critic, xb, with_recons=False,
                compute_dtype="bfloat16", mask_source="saliency",
                saliency_method="layercam", saliency_tta_flip=flip,
                saliency_tta_shift=shift,
            )
            return jnp.sum(out["diff"].astype(jnp.float32))
        return jax.jit(fn)

    def timeit(fn, reps=5, iters=20):
        np.asarray(jax.device_get(fn(x)))
        meds = []
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(iters):
                r = fn(x)
            np.asarray(jax.device_get(r))
            meds.append((time.perf_counter() - t0) / iters)
        return float(np.median(meds))

    res = {"platform": jax.default_backend(), "batch": B}
    for name, flip, shift in (("off", False, 0), ("flip", True, 0),
                              ("flip_shift2", True, 2)):
        s = timeit(make(flip, shift))
        res[name] = {"ms": round(1e3 * s, 3),
                     "frames_per_sec": round(B / s, 1)}
        print(name, res[name], flush=True)

    with open(out_path, "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    main(*sys.argv[1:])
