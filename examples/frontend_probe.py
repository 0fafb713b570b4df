"""On-chip A/B: merged front-end × block0_f32 on the full pipeline (round 4).
Writes /tmp/frontend_probe.json."""

import json
import os
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    cache = os.path.expanduser("~/.cache/critic_vae_tpu/jax")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from critic_vae_tpu.data.synthetic import generate_frames
    from critic_vae_tpu.models import vae as vae_mod
    from critic_vae_tpu.models.critic import load_critic
    from critic_vae_tpu.ops.mask import episode_forward, normalize_diffs, threshold_masks

    critic_params = load_critic(
        "/root/reference/saved-networks/"
        "critic-rewidx=1-cepochs=15-datamode=trunk-datasize=99999-shift=12-"
        "chfak=1-dropout=0.3.pt"
    )
    vae_params, bn_state = vae_mod.init_vae_params(jax.random.key(0))
    B = 1024
    frames_u8, _ = generate_frames(B, seed=0)
    frames = jnp.asarray(frames_u8.astype(np.float32) / 255.0)  # f32 like bench
    thresholds = jnp.asarray(list(range(0, 130, 10)))

    def timed(fn, args, iters=40, reps=3):
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0]).ravel()[:8]
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(*args)
            np.asarray(jax.tree.leaves(out)[0]).ravel()[:8]
            times.append((time.perf_counter() - t0) / iters)
        return float(np.median(times))

    def make_pipe(**kw):
        @jax.jit
        def pipe(fr):
            out = episode_forward(
                vae_params, bn_state, critic_params, fr,
                with_recons=False, compute_dtype="bfloat16", **kw,
            )
            diff_u8, _ = normalize_diffs(out["diff"], out["max_value"])
            return out["preds"], diff_u8, threshold_masks(diff_u8, thresholds)
        return pipe

    results = {}
    variants = {
        "base": {},
        "merged": dict(front_end="merged"),
        "merged_b0f32": dict(front_end="merged", block0_f32=True),
    }
    pipes = {}
    for name, kw in variants.items():
        pipes[name] = make_pipe(**kw)
        ms = timed(pipes[name], (frames,))
        results[name] = {"ms": round(ms * 1e3, 3), "fps": round(B / ms, 1)}
        print(name, results[name], flush=True)

    best = min(
        (k for k in variants), key=lambda k: results[k]["ms"]
    )
    p0, d0, m0 = [np.asarray(t) for t in pipes["base"](frames)]
    p1, d1, m1 = [np.asarray(t) for t in pipes[best](frames)]
    results["agreement_best_vs_base"] = {
        "variant": best,
        "pred_max_abs": float(np.max(np.abs(p0 - p1))),
        "diff_u8_within1": float(np.mean(
            np.abs(d0.astype(np.int32) - d1.astype(np.int32)) <= 1)),
        "mask_agree": float(np.mean(m0 == m1)),
    }
    print("agreement", results["agreement_best_vs_base"], flush=True)

    with open("/tmp/frontend_probe.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
