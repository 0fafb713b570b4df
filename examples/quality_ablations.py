"""Quality-ceiling ablations for the synthetic full-stack demo.

The demo reaches thr_iou ≈ 0.10 (docs/RESULTS.md). This script substantiates
*why* by isolating each stage of the chain:

1. **machinery oracle** — GT-derived diff maps pushed through the exact
   normalize → quantize → threshold (→ CRF) machinery. Near-1.0 IoU means
   the mask machinery is not the limiter.
2. **oracle critic values** — the trained VAE's double-decode diff, but with
   the decoder conditioned on GT presence labels instead of critic
   predictions. Separates critic-signal quality from VAE conditioning.
3. **data-scale sweep** — the full train→eval loop at 1×/2×/4× training
   data. A plateau shows the ceiling is the learned signal, not data volume.

Run: python examples/quality_ablations.py [out_dir]  (expects a TPU; writes
ablations.json and prints a table). Results are recorded in docs/RESULTS.md.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

THRESHOLDS = tuple(range(0, 130, 10))  # reference sweep (vae.py:121)


def mask_from_diff(diff, max_value, gt, crf_frames=None):
    """Run raw diff maps through the pipeline's normalize→threshold→IoU
    machinery (and optionally CRF at the best threshold)."""
    import jax.numpy as jnp

    from critic_vae_tpu.ops.mask import iou_stacked, normalize_diffs, threshold_masks

    diff_u8, _ = normalize_diffs(jnp.asarray(diff), jnp.asarray(max_value))
    masks = threshold_masks(diff_u8, jnp.asarray(THRESHOLDS))
    ious = np.asarray(iou_stacked(jnp.asarray(gt), masks))
    best = int(np.argmax(ious))
    out = {
        "best_threshold": THRESHOLDS[best],
        "best_thr_iou": round(float(ious[best]), 3),
        "iou_at_t50": round(float(ious[THRESHOLDS.index(50)]), 3),
    }
    if crf_frames is not None:
        from critic_vae_tpu.crf import refine_masks
        from critic_vae_tpu.ops.iou import iou

        refined = refine_masks(crf_frames, np.asarray(masks[best]))
        out["crf_iou_at_best"] = iou(gt, refined)
    return out


def model_diff(params, bn, critic_params, frames_u8, values=None):
    """The trained model's double-decode diff signal, optionally with
    injected (oracle) conditioning values instead of critic predictions."""
    import jax
    import jax.numpy as jnp

    from critic_vae_tpu.models.critic import critic_apply
    from critic_vae_tpu.ops.mask import diff_images

    diffs, maxes = [], []
    for i in range(0, len(frames_u8), 512):
        x = jnp.asarray(frames_u8[i : i + 512].astype(np.float32) / 255.0)
        v = (
            jnp.asarray(values[i : i + 512].astype(np.float32))
            if values is not None
            else critic_apply(critic_params, x)[:, 0]
        )
        _, _, diff, maxv = diff_images(params, bn, x, v)
        host = jax.device_get({"d": diff, "m": maxv})
        diffs.append(host["d"])
        maxes.append(host["m"])
    return np.concatenate(diffs), np.concatenate(maxes)


def main(out_dir="/tmp/cvt-ablations"):
    import jax

    cache = os.path.expanduser("~/.cache/critic_vae_tpu/jax")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from critic_vae_tpu.data.sampler import balanced_critic_sampler
    from critic_vae_tpu.data.synthetic import generate_frames
    from critic_vae_tpu.pipelines.train import train
    from critic_vae_tpu.train.critic import labels_from_masks, train_critic

    os.makedirs(out_dir, exist_ok=True)
    t0 = time.time()
    results = {}

    ep_frames, ep_gt = generate_frames(550, seed=9999)

    # --- 1. machinery oracle: GT itself as the raw diff signal -------------
    print("[1/3] machinery oracle (GT-derived diff through the mask path)...")
    oracle_diff = ep_gt.astype(np.float32)  # perfect localization, unit amp
    oracle_max = oracle_diff.max(axis=(1, 2))
    results["machinery_oracle"] = mask_from_diff(
        oracle_diff, oracle_max, ep_gt, crf_frames=ep_frames
    )
    print(f"    {results['machinery_oracle']}")

    # --- shared critic for 2./3. -------------------------------------------
    print("    training critic (12800 frames, 15 epochs)...")
    cf, cg = generate_frames(12800, seed=0)
    critic_params, _ = train_critic(
        cf, labels_from_masks(cg), epochs=15, batch_size=128,
        dropout_rate=0.3, progress=False,
    )

    # --- 2. + 3. train VAEs at 1x/2x/4x data, eval real + oracle values ----
    for scale in (1, 2, 4):
        total = 20000 * scale
        print(f"[2-3/3] scale {scale}x: sampling {total} frames...")

        def trajs():
            for t in range(16 * scale):
                f, _ = generate_frames(2048, seed=100 + t)
                yield f"synth-{t}", f.astype(np.float32) / 255.0

        dset = balanced_critic_sampler(trajs(), critic_params, total_images=total)
        print(f"    collected {len(dset)}; training 7 epochs...")
        state = train(
            critic_params, dset, epochs=7, batch_size=128,
            log_dir=None, checkpoint_dir=None, resume=False, progress=False,
        )
        params = jax.device_get(state.params)
        bn = jax.device_get(state.bn_state)

        diff, maxv = model_diff(params, bn, critic_params, ep_frames)
        results[f"trained_{scale}x"] = mask_from_diff(
            diff, maxv, ep_gt, crf_frames=ep_frames
        )
        print(f"    trained_{scale}x: {results[f'trained_{scale}x']}")

        oracle_vals = labels_from_masks(ep_gt).astype(np.float32)
        diff_o, maxv_o = model_diff(
            params, bn, critic_params, ep_frames, values=oracle_vals
        )
        results[f"oracle_values_{scale}x"] = mask_from_diff(diff_o, maxv_o, ep_gt)
        print(f"    oracle_values_{scale}x: {results[f'oracle_values_{scale}x']}")

        # --- 4. device-CRF hyperparameter search at the 1x point ----------
        if scale == 1:
            import jax.numpy as jnp

            from critic_vae_tpu.crf.device import crf_param_search
            from critic_vae_tpu.ops.mask import normalize_diffs, threshold_masks

            print("[4] CRF param search (device backend, 27 combos)...")
            diff_u8, _ = normalize_diffs(jnp.asarray(diff), jnp.asarray(maxv))
            best_t = results["trained_1x"]["best_threshold"]
            masks = np.asarray(
                threshold_masks(diff_u8, jnp.asarray([best_t]))[0]
            )
            _, search = crf_param_search(
                ep_frames, masks, ep_gt,
                {"w1": [11.0, 22.0, 44.0],
                 "beta": [3.1, 6.2, 12.4],
                 "w2": [4.0, 8.0, 16.0]},
            )
            fixed = next(s for s, p in search
                         if p == (22.0, 12.0, 3.1, 8.0, 1.8, 10))
            results["crf_search_1x"] = {
                "fixed_params_iou": round(fixed, 3),
                "best_iou": round(search[0][0], 3),
                "best_params": search[0][1],
                "combos": len(search),
            }
            print(f"    crf_search_1x: {results['crf_search_1x']}")

    results["wall_seconds"] = round(time.time() - t0, 1)
    with open(os.path.join(out_dir, "ablations.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))
    return results


if __name__ == "__main__":
    main(*sys.argv[1:])
