"""On-chip A/B: f32 first block inside the bf16 serving pipeline (round 4).
Writes /tmp/block0_probe.json."""

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

    results = {}

    @jax.jit
    def enc_b0(fr):
        mu, _, _ = vae_mod.encode(vae_params, bn_state, fr, block0_f32=True)
        return jnp.sum(mu.astype(jnp.float32))

    @jax.jit
    def cr_b0(fr):
        return jnp.sum(critic_apply(critic_params, fr, block0_f32=True))

    results["enc_block0_f32"] = round(timed(enc_b0, (frames,), iters=30) * 1e3, 3)
    print("enc_block0_f32", results["enc_block0_f32"], flush=True)
    results["critic_block0_f32"] = round(timed(cr_b0, (frames,), iters=30) * 1e3, 3)
    print("critic_block0_f32", results["critic_block0_f32"], flush=True)

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

    base = make_pipe()
    b0 = make_pipe(block0_f32=True)
    for name, pipe in (("full_base", base), ("full_block0_f32", b0)):
        ms = timed(pipe, (frames,))
        results[name] = {"ms": round(ms * 1e3, 3), "fps": round(B / ms, 1)}
        print(name, results[name], flush=True)

    # agreement vs the f32 reference pipeline
    frames32 = frames.astype(jnp.float32)
    ref = make_pipe(compute_dtype="float32") if False else None
    p0, d0, m0 = [np.asarray(t) for t in base(frames)]
    p1, d1, m1 = [np.asarray(t) for t in b0(frames)]
    results["agreement_vs_bf16base"] = {
        "pred_max_abs": float(np.max(np.abs(p0 - p1))),
        "diff_u8_within1": float(np.mean(
            np.abs(d0.astype(np.int32) - d1.astype(np.int32)) <= 1)),
        "mask_agree": float(np.mean(m0 == m1)),
    }
    print("agreement", results["agreement_vs_bf16base"], flush=True)

    # batch 2048 with block0_f32
    f2_u8, _ = generate_frames(2048, seed=1)
    f2 = jnp.asarray(f2_u8.astype(np.float32) / 255.0).astype(jnp.bfloat16)
    ms = timed(b0, (f2,), iters=25)
    results["full_block0_f32_b2048"] = {"ms": round(ms * 1e3, 3), "fps": round(2048 / ms, 1)}
    print("b2048", results["full_block0_f32_b2048"], flush=True)

    with open("/tmp/block0_probe.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
