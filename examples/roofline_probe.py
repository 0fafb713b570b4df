"""Per-stage roofline probe for the serving pipeline (round 4, VERDICT #1).

Times each stage of the mask-video serving chain separately on the real
chip — critic, encoder, doubled-batch decoder(+diff tail), full pipeline —
plus a batch sweep, and dumps XLA cost/memory analysis per program. The
goal is a *measured* (not cost-model) breakdown of where the 7 µs/frame
go, to decide which stage a VMEM-resident Pallas formulation should attack
(reference anchor: the batch-1 loop being replaced,
/root/reference/vae_utility.py:162-184).

Writes JSON to /tmp/roofline_r4.json and prints it.
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
    from critic_vae_tpu.models import critic as critic_mod
    from critic_vae_tpu.models import vae as vae_mod
    from critic_vae_tpu.models.critic import load_critic
    from critic_vae_tpu.ops.mask import (
        REC601,
        episode_forward,
        normalize_diffs,
        threshold_masks,
    )

    dtype = jnp.bfloat16
    critic_path = (
        "/root/reference/saved-networks/"
        "critic-rewidx=1-cepochs=15-datamode=trunk-datasize=99999-shift=12-"
        "chfak=1-dropout=0.3.pt"
    )
    critic_params = load_critic(critic_path)
    vae_params, bn_state = vae_mod.init_vae_params(jax.random.key(0))

    def timed(fn, args, iters=30, reps=3):
        # warm-up/compile; fetch a small output as the true barrier
        out = fn(*args)
        first = jax.tree.leaves(out)[0]
        np.asarray(first)
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(*args)
            np.asarray(jax.tree.leaves(out)[0])
            times.append((time.perf_counter() - t0) / iters)
        return float(np.median(times)), [float(t) for t in times]

    def analyze(fn, args):
        lowered = jax.jit(fn).lower(*args)
        comp = lowered.compile()
        ca = comp.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        ma = comp.memory_analysis()
        return {
            "flops": float(ca.get("flops", -1)),
            "bytes_accessed": float(ca.get("bytes accessed", -1)),
            "temp_bytes": getattr(ma, "temp_size_in_bytes", -1),
            "arg_bytes": getattr(ma, "argument_size_in_bytes", -1),
            "out_bytes": getattr(ma, "output_size_in_bytes", -1),
        }

    results = {"device": str(jax.devices()[0])}
    B = 1024
    frames_u8, _ = generate_frames(B, seed=0)
    frames = jnp.asarray(frames_u8.astype(np.float32) / 255.0).astype(dtype)
    thresholds = jnp.asarray(list(range(0, 130, 10)))

    # --- full pipeline (the bench program) ---
    @jax.jit
    def full(fr):
        out = episode_forward(
            vae_params, bn_state, critic_params, fr,
            with_recons=False, compute_dtype="bfloat16",
        )
        diff_u8, _ = normalize_diffs(out["diff"], out["max_value"])
        return out["preds"], diff_u8, threshold_masks(diff_u8, thresholds)

    # --- critic only ---
    @jax.jit
    def critic_only(fr):
        return critic_mod.critic_apply(critic_params, fr)[:, 0]

    # --- encoder only ---
    @jax.jit
    def encode_only(fr):
        mu, _, _ = vae_mod.encode(vae_params, bn_state, fr, train=False)
        return mu

    # --- doubled-batch decode + diff tail, from precomputed mu ---
    mu0 = np.asarray(encode_only(frames))
    mu_dev = jnp.asarray(mu0)
    vals = jnp.asarray(np.random.default_rng(0).uniform(size=(B,)).astype(np.float32)).astype(dtype)

    @jax.jit
    def decode_double(mu, values):
        b = mu.shape[0]
        pre = vae_mod.decode(
            vae_params,
            jnp.concatenate([mu, mu], axis=0),
            jnp.concatenate([values, jnp.zeros((b,), values.dtype)]),
            apply_tanh=False,
        )
        r1, r0 = jnp.tanh(pre[:b]), jnp.tanh(pre[b:])
        d = jnp.abs(r0.astype(jnp.float32) - r1.astype(jnp.float32))
        grey = d[..., 0] * REC601[0] + d[..., 1] * REC601[1] + d[..., 2] * REC601[2]
        return grey, jnp.max(grey, axis=(1, 2))

    @jax.jit
    def decode_single(mu, values):
        pre = vae_mod.decode(vae_params, mu, values, apply_tanh=False)
        return jnp.tanh(pre)

    for name, fn, args in [
        ("full_b1024", full, (frames,)),
        ("critic_b1024", critic_only, (frames,)),
        ("encode_b1024", encode_only, (frames,)),
        ("decode_double_b1024", decode_double, (mu_dev, vals)),
        ("decode_single_b1024", decode_single, (mu_dev, vals)),
    ]:
        med, times = timed(fn, args)
        results[name] = {
            "ms": round(med * 1e3, 3),
            "us_per_frame": round(med / B * 1e6, 3),
            "fps": round(B / med, 1),
            "times_ms": [round(t * 1e3, 3) for t in times],
            "analysis": analyze(fn, args),
        }
        print(name, json.dumps(results[name]), flush=True)

    # --- batch sweep on the full pipeline ---
    for b in (512, 2048, 4096):
        fr_u8, _ = generate_frames(b, seed=0)
        fr = jnp.asarray(fr_u8.astype(np.float32) / 255.0).astype(dtype)
        med, times = timed(full, (fr,), iters=20)
        results[f"full_b{b}"] = {
            "ms": round(med * 1e3, 3),
            "fps": round(b / med, 1),
            "times_ms": [round(t * 1e3, 3) for t in times],
        }
        print(f"full_b{b}", json.dumps(results[f"full_b{b}"]), flush=True)

    with open("/tmp/roofline_r4.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
