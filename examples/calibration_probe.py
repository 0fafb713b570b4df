"""Chip calibration: real HBM bandwidth + MXU peak through this stack, and
the merged-first-conv variant (round 4). Writes /tmp/calibration.json."""

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
    rng = np.random.default_rng(0)

    # --- HBM bandwidth: elementwise copy-scale over 268 MB bf16 ---
    big = jnp.asarray(rng.normal(size=(1024, 64, 64, 32)).astype(np.float32)).astype(jnp.bfloat16)

    @jax.jit
    def scale(x):
        return x * jnp.asarray(1.0009, x.dtype)

    ms = timed(scale, (big,))
    nbytes = big.size * 2
    results["copy268MB"] = {
        "ms": round(ms * 1e3, 3),
        "GBps": round(2 * nbytes / ms / 1e9, 1),  # read + write
    }
    print("copy268MB", results["copy268MB"], flush=True)

    @jax.jit
    def reduce_(x):
        return jnp.sum(x.astype(jnp.float32))

    ms = timed(reduce_, (big,))
    results["reduce268MB"] = {
        "ms": round(ms * 1e3, 3),
        "GBps": round(nbytes / ms / 1e9, 1),
    }
    print("reduce268MB", results["reduce268MB"], flush=True)

    # maxpool2 over the 268 MB tensor (the per-block pool cost in isolation)
    @jax.jit
    def pool(x):
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")

    ms = timed(pool, (big,))
    results["maxpool268MB"] = {
        "ms": round(ms * 1e3, 3),
        "GBps": round(1.25 * nbytes / ms / 1e9, 1),
    }
    print("maxpool268MB", results["maxpool268MB"], flush=True)

    # --- MXU peak: large dense matmul ---
    a = jnp.asarray(rng.normal(size=(4096, 8192)).astype(np.float32)).astype(jnp.bfloat16)
    b = jnp.asarray(rng.normal(size=(8192, 8192)).astype(np.float32)).astype(jnp.bfloat16)

    @jax.jit
    def mm(a, b):
        return jnp.sum((a @ b).astype(jnp.float32))

    ms = timed(mm, (a, b), iters=20)
    fl = 2 * 4096 * 8192 * 8192
    results["matmul_bf16"] = {
        "ms": round(ms * 1e3, 3),
        "TFLOPs": round(fl / ms / 1e12, 1),
    }
    print("matmul_bf16", results["matmul_bf16"], flush=True)

    # --- merged first conv: critic 3x3 (zero-padded to 5x5) + encoder 5x5
    # share one input pass: (B,64,64,3) -> 40ch ---
    from critic_vae_tpu.data.synthetic import generate_frames
    from critic_vae_tpu.models import vae as vae_mod
    from critic_vae_tpu.models.critic import load_critic

    critic_params = load_critic(
        "/root/reference/saved-networks/"
        "critic-rewidx=1-cepochs=15-datamode=trunk-datasize=99999-shift=12-"
        "chfak=1-dropout=0.3.pt"
    )
    vae_params, _ = vae_mod.init_vae_params(jax.random.key(0))
    B = 1024
    frames_u8, _ = generate_frames(B, seed=0)
    frames = jnp.asarray(frames_u8.astype(np.float32) / 255.0).astype(jnp.bfloat16)

    w_enc = vae_params["encoder"]["conv0"]["w"].astype(jnp.bfloat16)  # (5,5,3,32)
    w_cr = jnp.pad(
        critic_params["conv0_w"].astype(jnp.bfloat16), ((1, 1), (1, 1), (0, 0), (0, 0))
    )  # 3x3 -> 5x5
    w_merged = jnp.concatenate([w_enc, w_cr], axis=-1)  # (5,5,3,40)

    @jax.jit
    def conv_merged(x, w):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.sum(y.astype(jnp.float32))

    results["conv1_merged40"] = round(timed(conv_merged, (frames, w_merged)) * 1e3, 3)
    print("conv1_merged40", results["conv1_merged40"], flush=True)

    @jax.jit
    def conv_two(x, we, wc):
        y1 = jax.lax.conv_general_dilated(
            x, we, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y2 = jax.lax.conv_general_dilated(
            x, wc, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.sum(y1.astype(jnp.float32)) + jnp.sum(y2.astype(jnp.float32))

    results["conv1_two_separate"] = round(
        timed(conv_two, (frames, w_enc, w_cr)) * 1e3, 3)
    print("conv1_two_separate", results["conv1_two_separate"], flush=True)

    # f32 conv1 for comparison (is bf16 even helping here?)
    frames32 = frames.astype(jnp.float32)

    @jax.jit
    def conv1_f32(x, w):
        y = jax.lax.conv_general_dilated(
            x, w.astype(jnp.float32), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.sum(y)

    results["conv1_enc_f32"] = round(timed(conv1_f32, (frames32, w_enc)) * 1e3, 3)
    print("conv1_enc_f32", results["conv1_enc_f32"], flush=True)

    with open("/tmp/calibration.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
