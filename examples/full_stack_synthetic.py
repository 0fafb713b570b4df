"""Full-stack end-to-end run on synthetic data: critic training → balanced
sampling → VAE training → mask-video pipeline with CRF + IoU + GIF.

The bundled MineRL episode blobs are absent from the reference mount and the
pretrained critic carries no signal on synthetic scenes, so this script
demonstrates the complete Critic-VAE loop built entirely from framework
primitives. Run: python examples/full_stack_synthetic.py [out_dir]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(out_dir="/tmp/cvt-fullstack"):
    import jax

    cache = os.path.expanduser("~/.cache/critic_vae_tpu/jax")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from critic_vae_tpu.data.sampler import balanced_critic_sampler
    from critic_vae_tpu.data.synthetic import generate_frames
    from critic_vae_tpu.models.critic import save_critic
    from critic_vae_tpu.pipelines.train import save_final_weights, train
    from critic_vae_tpu.pipelines.video import (
        bin_diagnostics,
        compose_frames,
        eval_episode,
        write_bin_info,
    )
    from critic_vae_tpu.train.critic import (
        critic_accuracy,
        labels_from_masks,
        train_critic,
    )
    from critic_vae_tpu.viz.gif import write_gif

    os.makedirs(out_dir, exist_ok=True)
    t0 = time.time()

    # 1. critic from scratch
    print("[1/4] training critic on synthetic frames...")
    frames, gt = generate_frames(12800, seed=0)
    labels = labels_from_masks(gt)
    critic_params, closs = train_critic(
        frames, labels, epochs=15, batch_size=128, dropout_rate=0.3, progress=False
    )
    hf, hg = generate_frames(1024, seed=777)
    acc = critic_accuracy(critic_params, hf, labels_from_masks(hg))
    print(f"    critic: loss={closs:.4f} holdout_acc={acc:.3f}")
    save_critic(os.path.join(out_dir, "critic.npz"), critic_params)

    # 2. balanced sampling with the fresh critic (reference bin semantics)
    print("[2/4] balanced-sampling training frames...")

    def trajs():
        for t in range(16):
            f, _ = generate_frames(2048, seed=100 + t)
            yield f"synth-{t}", f.astype(np.float32) / 255.0

    dset = balanced_critic_sampler(trajs(), critic_params, total_images=20000)
    print(f"    collected {len(dset)} frames")

    # 3. VAE training, reference config (7 epochs, batch 128, Adam 5e-5)
    print("[3/4] training VAE...")
    state = train(
        critic_params, dset, epochs=7, batch_size=128,
        log_dir=os.path.join(out_dir, "logs"), checkpoint_dir=None,
        resume=False, progress=False,
    )
    save_final_weights(
        state,
        os.path.join(out_dir, "vae_encoder.ckpt"),
        os.path.join(out_dir, "vae_decoder.ckpt"),
    )
    params = jax.device_get(state.params)
    bn = jax.device_get(state.bn_state)

    # 4. video pipeline on a fresh episode
    print("[4/4] mask-video pipeline...")
    ep_frames, ep_gt = generate_frames(550, seed=9999)
    result = eval_episode(
        params, bn, critic_params, ep_frames, ep_gt,
        threshold=50, run_crf=True, batch_size=512,
    )
    print(f"    thr_iou={result.thr_iou}")
    print(f"    crf_iou={result.crf_iou}")

    # device-CRF comparison: the exact mean-field the lattice approximates,
    # run as MXU matmuls (crf/device.py) — no host bottleneck
    from critic_vae_tpu.crf.device import refine_masks_device
    from critic_vae_tpu.ops.iou import iou as iou_fn

    dev_crf = refine_masks_device(ep_frames, result.thr_masks)
    print(f"    crf_iou(device-exact)={iou_fn(ep_gt, dev_crf)}")

    # beyond-reference contrast: the LayerCAM saliency mask source asks a
    # critic directly where its evidence is — no VAE in the mask path
    # (ops/saliency.py). NOT the fresh critic above: CAM quality is
    # critic-INSTANCE-dependent in a way prediction accuracy does not
    # reveal (this very script's fresh critic classifies at 1.000 holdout
    # accuracy yet its LayerCAM localization is degenerate — 0.1 thr /
    # 0.007 CRF when it was demoed here, the same failure the round-4
    # distill run hit; docs/RESULTS.md "mask self-distillation"). The
    # bundled critic-synthetic-gated.npz is the round-5 health-GATE-selected
    # instance (deletion_drop 0.685 >= CAM_HEALTH_TARGET_STRICT; chain
    # measured 0.64 thr / 0.96 CRF IoU on this very episode seed —
    # docs/artifacts/cam_health_target.json).
    from critic_vae_tpu.models.critic import load_critic
    from critic_vae_tpu.pipelines.video import threshold_sweep

    cam_critic = load_critic(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "saved-networks", "critic-synthetic-gated.npz"))
    sal = {"method": "layercam", "tta_flip": True, "tta_shift": 2}
    sweep = threshold_sweep(
        params, bn, cam_critic, ep_frames, ep_gt,
        thresholds=list(range(60, 161, 20)), run_crf=False,
        mask_source="saliency", saliency_opts=sal, batch_size=512,
    )
    best = max(sweep, key=lambda r: r["thr_iou"])
    print(f"    layercam+TTA thr_iou={best['thr_iou']} "
          f"@thr={best['threshold']} (vs diff {result.thr_iou})")
    cam = eval_episode(
        params, bn, cam_critic, ep_frames, ep_gt,
        threshold=best["threshold"], run_crf=False, with_recons=False,
        mask_source="saliency", saliency_opts=sal, batch_size=512,
    )
    # CAM masks want a ~6x stronger bilateral term than the reference
    # CRF tuple (docs/RESULTS.md "Re-tuning the CRF for CAM masks")
    cam_crf = refine_masks_device(
        ep_frames, cam.thr_masks, (132.0, 32.0, 3.1, 8.0, 1.8, 10))
    print(f"    layercam+TTA + tuned CRF iou={iou_fn(ep_gt, cam_crf)} "
          f"(vs diff+CRF {result.crf_iou})")
    diag = bin_diagnostics(result.preds, ep_gt, result.thr_masks)
    write_bin_info(diag, os.path.join(out_dir, "bin_info_vae1.txt"), len(ep_frames))
    strips = compose_frames(ep_frames[:120], result, ep_gt[:120], threshold=50)
    write_gif(strips, os.path.join(out_dir, "video-threshold=50.gif"))
    print(f"done in {time.time() - t0:.0f}s → {out_dir}")
    return result


if __name__ == "__main__":
    main(*sys.argv[1:])
