"""Per-block serving profile: encoder/critic prefixes, raw conv shapes,
mask-output cost (round 4). Writes /tmp/perblock_probe.json."""

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
    from critic_vae_tpu.models.critic import critic_apply, load_critic
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
    enc = vae_params["encoder"]

    # --- encoder prefixes (blocks 1..k) ---
    def make_prefix(k):
        @jax.jit
        def f(x):
            for i in range(k):
                y = vae_mod._conv5_same(x, enc[f"conv{i}"]["w"].astype(x.dtype),
                                        enc[f"conv{i}"]["b"].astype(x.dtype))
                y, _ = vae_mod._batchnorm(y, enc[f"bn{i}"], bn_state[f"bn{i}"], False)
                y = vae_mod._maxpool2(y)
                x = jnp.tanh(y) if i == 3 else jax.nn.relu(y)
            return jnp.sum(x.astype(jnp.float32))
        return f

    for k in (1, 2, 3, 4):
        results[f"enc_prefix{k}"] = round(timed(make_prefix(k), (frames,)) * 1e3, 3)
        print(f"enc_prefix{k}", results[f"enc_prefix{k}"], flush=True)

    # --- raw convs at each block shape (bias, no pool/BN) ---
    shapes = [(64, 3, 32), (32, 32, 64), (16, 64, 128), (8, 128, 256)]
    rng = np.random.default_rng(0)
    for i, (hw, cin, cout) in enumerate(shapes):
        x = jnp.asarray(rng.normal(size=(B, hw, hw, cin)).astype(np.float32)).astype(jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(5, 5, cin, cout)).astype(np.float32) * 0.05).astype(jnp.bfloat16)

        @jax.jit
        def conv_only(x, w):
            y = jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return jnp.sum(y.astype(jnp.float32))

        results[f"rawconv{i}"] = round(timed(conv_only, (x, w)) * 1e3, 3)
        print(f"rawconv{i}", results[f"rawconv{i}"], flush=True)

    # conv1 with input channel padded 3 -> 8 (zero weights)
    x8 = jnp.concatenate([frames, jnp.zeros((B, 64, 64, 5), frames.dtype)], axis=-1)
    w8 = jnp.concatenate(
        [enc["conv0"]["w"].astype(jnp.bfloat16),
         jnp.zeros((5, 5, 5, 32), jnp.bfloat16)], axis=2)

    @jax.jit
    def conv1_pad8(x, w):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.sum(y.astype(jnp.float32))

    results["rawconv0_pad8"] = round(timed(conv1_pad8, (x8, w8)) * 1e3, 3)
    print("rawconv0_pad8", results["rawconv0_pad8"], flush=True)

    # --- critic prefixes ---
    def make_critic_prefix(k):
        @jax.jit
        def f(x):
            for i in range(k):
                y = jax.lax.conv_general_dilated(
                    x, critic_params[f"conv{i}_w"].astype(x.dtype), (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                ) + critic_params[f"conv{i}_b"].astype(x.dtype)
                y = jax.nn.relu(y)
                x = vae_mod._maxpool2(y)
            return jnp.sum(x.astype(jnp.float32))
        return f

    for k in (1, 2, 3, 4):
        results[f"critic_prefix{k}"] = round(
            timed(make_critic_prefix(k), (frames,)) * 1e3, 3)
        print(f"critic_prefix{k}", results[f"critic_prefix{k}"], flush=True)

    @jax.jit
    def critic_full(x):
        return jnp.sum(critic_apply(critic_params, x))

    results["critic_full"] = round(timed(critic_full, (frames,)) * 1e3, 3)
    print("critic_full", results["critic_full"], flush=True)

    # --- mask output cost: full pipeline variants ---
    def make_pipe(mode):
        @jax.jit
        def pipe(fr):
            out = episode_forward(
                vae_params, bn_state, critic_params, fr,
                with_recons=False, compute_dtype="bfloat16",
            )
            diff_u8, _ = normalize_diffs(out["diff"], out["max_value"])
            if mode == "masks":
                return out["preds"], diff_u8, threshold_masks(diff_u8, thresholds)
            if mode == "stats":
                m = threshold_masks(diff_u8, thresholds)
                return out["preds"], diff_u8, jnp.sum(m, axis=(1, 2, 3))
            return out["preds"], diff_u8
        return pipe

    for mode in ("masks", "stats", "diffonly"):
        ms = timed(make_pipe(mode), (frames,), iters=40)
        results[f"pipe_{mode}"] = {"ms": round(ms * 1e3, 3), "fps": round(B / ms, 1)}
        print(f"pipe_{mode}", results[f"pipe_{mode}"], flush=True)

    with open("/tmp/perblock_probe.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
