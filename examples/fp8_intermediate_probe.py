"""fp8 (e4m3) storage for the front-end's pool intermediate (round 4).

The merged front-end conv writes a (B,64,64,40) intermediate that only
feeds 2×2 max-pools. Quantizing the POST-bias/BN values to float8_e4m3fn
in the conv epilogue halves that buffer's HBM bytes, and because fp8→bf16
dequantization is monotone the pool's max commutes with it exactly — the
only numeric change is e4m3 quantization (≈2^-4 relative) of the pooled
activations. This probe measures (a) whether reduce_window(max) lowers
over f8 on this chip at all, (b) the block-level and full-pipeline
timing, (c) mask agreement vs the bf16 path. Methodology per
docs/DESIGN.md round 4: sum-reduced outputs as barriers, warm programs,
median of reps.

Run: PYTHONPATH=/root/repo:/root/.axon_site python examples/fp8_intermediate_probe.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, *args, reps=5, iters=20):
    import jax

    np.asarray(jax.device_get(fn(*args)))  # compile + warm
    best = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(*args)
        np.asarray(jax.device_get(r))
        best.append((time.perf_counter() - t0) / iters)
    return float(np.median(best) * 1e3)  # ms


def main(out_path="/tmp/fp8_probe.json"):
    import jax
    import jax.numpy as jnp

    cache = os.path.expanduser("~/.cache/critic_vae_tpu/jax")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from critic_vae_tpu.models.vae import _maxpool2

    res = {"platform": jax.default_backend()}
    f8 = jnp.float8_e4m3fn

    # (a) does reduce_window(max) lower over f8 at all?
    try:
        x8 = jnp.arange(64, dtype=jnp.float32).reshape(1, 8, 8, 1).astype(f8)
        p = np.asarray(_maxpool2(x8).astype(jnp.float32))
        ref = np.asarray(
            _maxpool2(x8.astype(jnp.float32)))
        res["f8_reduce_window"] = bool(np.array_equal(p, ref))
    except Exception as e:  # noqa: BLE001
        res["f8_reduce_window"] = f"unsupported: {type(e).__name__}: {e}"
    print("f8 reduce_window:", res["f8_reduce_window"], flush=True)

    # (b) block-level timing: merged-front-end-shaped conv -> affine ->
    # [cast] -> pool -> relu, B=1024 bf16 (the bench configuration)
    B = 1024
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((B, 64, 64, 3), np.float32), jnp.bfloat16)
    w = jnp.asarray(rng.normal(0, 0.1, (5, 5, 3, 40)), jnp.bfloat16)
    scale = jnp.asarray(rng.normal(1, 0.1, (40,)), jnp.float32)
    bias = jnp.asarray(rng.normal(0, 0.1, (40,)), jnp.float32)

    def front(x, store_dtype):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        z = (y.astype(jnp.float32) * scale + bias).astype(store_dtype)
        pooled = _maxpool2(z).astype(jnp.bfloat16)
        return jnp.sum(jax.nn.relu(pooled), dtype=jnp.float32)

    for name, dt in (("bf16", jnp.bfloat16), ("fp8", f8)):
        try:
            fn = jax.jit(lambda xb, _dt=dt: front(xb, _dt))
            res[f"block_ms_{name}"] = round(timeit(fn, x), 3)
        except Exception as e:  # noqa: BLE001
            res[f"block_ms_{name}"] = f"failed: {type(e).__name__}: {e}"
        print(f"block {name}: {res[f'block_ms_{name}']}", flush=True)

    with open(out_path, "w") as fh:
        json.dump(res, fh, indent=2)
    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    main(*sys.argv[1:])
