"""Decompose the s2d block-1 cost on-chip: transform, conv, tail (round 4).
Writes /tmp/s2d_parts.json."""

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
    from critic_vae_tpu.ops.poolconv import s2d_pool_weights, space_to_depth2

    vae_params, bn_state = vae_mod.init_vae_params(jax.random.key(0))
    enc = vae_params["encoder"]
    B = 1024
    frames_u8, _ = generate_frames(B, seed=0)
    frames = jnp.asarray(frames_u8.astype(np.float32) / 255.0).astype(jnp.bfloat16)

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

    @jax.jit
    def t_s2d(x):
        xp = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)))
        return jnp.sum(space_to_depth2(xp).astype(jnp.float32))

    results["s2d_transform"] = round(timed(t_s2d, (frames,)) * 1e3, 3)
    print("s2d_transform", results["s2d_transform"], flush=True)

    # identity-conv s2d: 2x2 stride-2 conv, channel (p,q,c) = delta
    eye = np.zeros((2, 2, 3, 12), np.float32)
    for p in range(2):
        for q in range(2):
            for c in range(3):
                eye[p, q, c, (p * 2 + q) * 3 + c] = 1.0
    eye = jnp.asarray(eye).astype(jnp.bfloat16)

    @jax.jit
    def t_s2d_conv(x):
        xp = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)))
        xs = jax.lax.conv_general_dilated(
            xp, eye, (2, 2), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.sum(xs.astype(jnp.float32))

    results["s2d_via_conv"] = round(timed(t_s2d_conv, (frames,)) * 1e3, 3)
    print("s2d_via_conv", results["s2d_via_conv"], flush=True)

    # pre-transformed conv alone
    xs_pre = jax.jit(lambda x: space_to_depth2(
        jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)))))(frames)
    xs_pre = jax.block_until_ready(xs_pre)
    w3 = jax.jit(lambda w: s2d_pool_weights(w.astype(jnp.bfloat16)))(enc["conv0"]["w"])

    @jax.jit
    def t_conv(xs, w3):
        y = jax.lax.conv_general_dilated(
            xs, w3, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.sum(y.astype(jnp.float32))

    results["conv3x3_on_s2d"] = round(timed(t_conv, (xs_pre, w3)) * 1e3, 3)
    print("conv3x3_on_s2d", results["conv3x3_on_s2d"], flush=True)

    # full block variants: (a) current (5-D reshape max), (b) slice-max,
    # (c) identity-conv s2d + slice-max
    def block(x, s2d_mode, slice_max):
        xp = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)))
        if s2d_mode == "conv":
            xs = jax.lax.conv_general_dilated(
                xp, eye, (2, 2), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        else:
            xs = space_to_depth2(xp)
        y = jax.lax.conv_general_dilated(
            xs, w3, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = y + jnp.tile(enc["conv0"]["b"].astype(y.dtype), 4)
        # BN per phase-channel (tiled stats), then max, then relu
        k = jax.lax.rsqrt(bn_state["bn0"]["var"] + 1e-5) * enc["bn0"]["scale"]
        kk = jnp.tile(k, 4).astype(y.dtype)
        bb = jnp.tile(
            (enc["bn0"]["bias"] - bn_state["bn0"]["mean"] * k), 4
        ).astype(y.dtype)
        y = y * kk + bb
        if slice_max:
            c = 32
            m = jnp.maximum(
                jnp.maximum(y[..., :c], y[..., c:2 * c]),
                jnp.maximum(y[..., 2 * c:3 * c], y[..., 3 * c:]),
            )
        else:
            b_, h2, w2, _ = y.shape
            m = jnp.max(y.reshape(b_, h2, w2, 4, 32), axis=3)
        return jnp.sum(jax.nn.relu(m).astype(jnp.float32))

    for name, mode, sl in [
        ("block1_s2d_reshape_max", "transpose", False),
        ("block1_s2d_slice_max", "transpose", True),
        ("block1_convs2d_slice_max", "conv", True),
    ]:
        f = jax.jit(lambda x, mode=mode, sl=sl: block(x, mode, sl))
        results[name] = round(timed(f, (frames,)) * 1e3, 3)
        print(name, results[name], flush=True)

    with open("/tmp/s2d_parts.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
