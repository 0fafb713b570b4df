"""On-chip A/B: BN folding, strided pool, uint8 ingest (round 4).

Encoder-only and full-pipeline timings at batch 1024 bf16; best combo also
at 2048. Writes /tmp/foldbn_probe.json.
"""

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
    frames = jnp.asarray(frames_u8.astype(np.float32) / 255.0).astype(jnp.bfloat16)
    frames_u8_dev = jnp.asarray(frames_u8)
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

    def make_encode(**kw):
        @jax.jit
        def f(fr):
            mu, _, _ = vae_mod.encode(vae_params, bn_state, fr, train=False, **kw)
            return jnp.sum(mu.astype(jnp.float32))
        return f

    for name, kw in [
        ("enc_base", {}),
        ("enc_fold", dict(fold_bn=True)),
        ("enc_strided", dict(pool_impl="strided")),
        ("enc_fold_strided", dict(fold_bn=True, pool_impl="strided")),
    ]:
        results[name] = round(timed(make_encode(**kw), (frames,)) * 1e3, 3)
        print(name, results[name], flush=True)

    def make_pipe(u8=False, **kw):
        @jax.jit
        def pipe(fr):
            out = episode_forward(
                vae_params, bn_state, critic_params, fr,
                with_recons=False, compute_dtype="bfloat16", **kw,
            )
            diff_u8, _ = normalize_diffs(out["diff"], out["max_value"])
            return out["preds"], diff_u8, threshold_masks(diff_u8, thresholds)
        return pipe

    for name, u8, kw in [
        ("full_base", False, {}),
        ("full_fold", False, dict(fold_bn=True)),
        ("full_fold_strided", False, dict(fold_bn=True, pool_impl="strided")),
        ("full_fold_u8", True, dict(fold_bn=True)),
        ("full_fold_strided_u8", True, dict(fold_bn=True, pool_impl="strided")),
    ]:
        arg = frames_u8_dev if u8 else frames
        ms = timed(make_pipe(**kw), (arg,), iters=40)
        results[name] = {"ms": round(ms * 1e3, 3), "fps": round(B / ms, 1)}
        print(name, results[name], flush=True)

    # best combo at batch 2048
    f2_u8, _ = generate_frames(2048, seed=1)
    f2 = jnp.asarray(f2_u8)
    ms = timed(make_pipe(u8=True, fold_bn=True, pool_impl="strided"), (f2,), iters=25)
    results["full_fold_strided_u8_b2048"] = {
        "ms": round(ms * 1e3, 3), "fps": round(2048 / ms, 1)
    }
    print("b2048", results["full_fold_strided_u8_b2048"], flush=True)

    with open("/tmp/foldbn_probe.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
