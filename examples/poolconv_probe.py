"""On-chip A/B of the phase-packed conv+pool serving path (round 4).

Times encode() per fused-block combo, critic fused vs not, and the full
mask pipeline fused vs baseline, at batch 1024 bf16 — picks the
FUSED_POOL_SERVING config. Writes /tmp/poolconv_probe.json.
"""

import itertools
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
    from critic_vae_tpu.models import critic as critic_mod
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
    frames = jnp.asarray(frames_u8.astype(np.float32) / 255.0).astype(jnp.bfloat16)
    thresholds = jnp.asarray(list(range(0, 130, 10)))

    def timed(fn, args, iters=30, reps=3):
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

    results = {}

    # encoder combos: returns only mu-sum (tiny fetch)
    def make_encode(combo):
        @jax.jit
        def f(fr):
            mu, _, _ = vae_mod.encode(
                vae_params, bn_state, fr, train=False, fused_pool=combo
            )
            return jnp.sum(mu.astype(jnp.float32))
        return f

    combos = [
        (False, False, False, False),
        (True, False, False, False),
        (True, True, False, False),
        (True, True, True, False),
        (True, True, True, True),
        (False, True, True, True),
        (False, False, True, True),
    ]
    for combo in combos:
        ms = timed(make_encode(combo), (frames,)) * 1e3
        key = "enc_" + "".join("T" if c else "F" for c in combo)
        results[key] = round(ms, 3)
        print(key, results[key], flush=True)

    # critic fused vs not
    for fused in (False, True):
        @jax.jit
        def cr(fr, fused=fused):
            return jnp.sum(
                critic_mod.critic_apply(critic_params, fr, fused_pool=fused)
            )
        ms = timed(cr, (frames,)) * 1e3
        results[f"critic_fused={fused}"] = round(ms, 3)
        print(f"critic_fused={fused}", results[f"critic_fused={fused}"], flush=True)

    # full pipeline fused vs baseline (bench program shape)
    for fused in (False, True):
        @jax.jit
        def pipe(fr, fused=fused):
            out = episode_forward(
                vae_params, bn_state, critic_params, fr,
                with_recons=False, compute_dtype="bfloat16", fused_pool=fused,
            )
            diff_u8, _ = normalize_diffs(out["diff"], out["max_value"])
            return out["preds"], diff_u8, threshold_masks(diff_u8, thresholds)
        ms = timed(pipe, (frames,), iters=40) * 1e3
        results[f"full_fused={fused}"] = {"ms": round(ms, 3), "fps": round(B / ms * 1e3, 1)}
        print(f"full_fused={fused}", results[f"full_fused={fused}"], flush=True)

    with open("/tmp/poolconv_probe.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
