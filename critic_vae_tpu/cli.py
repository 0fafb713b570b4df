"""Command-line interface.

Subcommand-per-mode replacement for the reference's seven boolean flags on
one script (reference: vae.py:23-31, dispatch at vae.py:111-166):

    python -m critic_vae_tpu train       ≙ vae.py -train
    python -m critic_vae_tpu eval        ≙ vae.py            (image eval)
    python -m critic_vae_tpu inject      ≙ vae.py -inject
    python -m critic_vae_tpu video       ≙ vae.py -video
    python -m critic_vae_tpu video --sweep ≙ vae.py -video -thresh
    python -m critic_vae_tpu dataset     ≙ vae.py -dataset
    python -m critic_vae_tpu second      ≙ vae.py -second
    python -m critic_vae_tpu evalsecond  ≙ vae.py -evalsecond

All hyperparameters default to the reference's values (vae_parameters.py)
and are overridable per flag — the reference requires editing its constants
module.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from typing import Optional

import numpy as np

from critic_vae_tpu.config import Config, default_config


def _add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("--root", default=".", help="working directory (paths resolve against it)")
    p.add_argument("--critic", default=None, help="critic .pt checkpoint path")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--profile", default=None, metavar="DIR",
        help="capture a JAX/XLA profiler trace of the device stage into DIR",
    )


def _add_vae_weights(p: argparse.ArgumentParser) -> None:
    p.add_argument("--encoder", default=None, help="encoder checkpoint (.npz)")
    p.add_argument("--decoder", default=None, help="decoder checkpoint (.npz)")


# argparse defaults derive from the typed config so the reference values
# live in exactly one place (config.py; SURVEY vae_parameters.py mapping)
_D = default_config()


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="critic_vae_tpu",
        description="TPU-native critic-conditioned VAE framework",
    )
    sub = ap.add_subparsers(dest="mode", required=True)

    t = sub.add_parser("train", help="train the VAE (reference: -train)")
    _add_common(t)
    t.add_argument("--source", default="synthetic", help="trajectory source: synthetic[:N[:T]] | minerl:<root> | <npy dir>")
    t.add_argument("--epochs", type=int, default=_D.train.epochs)
    t.add_argument("--batch-size", type=int, default=_D.train.batch_size)
    t.add_argument("--lr", type=float, default=_D.train.learning_rate)
    t.add_argument("--kld-weight", type=float, default=_D.train.kld_weight)
    t.add_argument("--total-images", type=int, default=_D.train.total_images)
    t.add_argument("--no-resume", action="store_true")
    t.add_argument("--log-dir", default=None)
    t.add_argument(
        "--log-images", action="store_true",
        help="log an originals-vs-reconstructions probe strip to "
        "TensorBoard every epoch (the reference's image_summary is dead "
        "code, logger.py:17-28)",
    )
    t.add_argument(
        "--correct-msssim", action="store_true",
        help="train with textbook MS-SSIM instead of the reference's quirky "
        "variant (proper Gaussian window, standard scale weighting) — "
        "anchors reconstruction luminance much better",
    )
    t.add_argument(
        "--dtype", default="float32", choices=["float32", "bfloat16"],
        help="conv/matmul compute dtype for the train step (params, Adam "
        "state, BN stats and the loss stay float32)",
    )
    t.add_argument(
        "--value-consistency", type=float, default=0.0, metavar="W",
        help="opt-in auxiliary loss strengthening the decoder's "
        "value-conditioning pathway (the measured quality limiter, "
        "docs/RESULTS.md): the frozen critic must read decode(mu, 0) as "
        "trunk-free and decode(mu, v) as probability v. 0 = off "
        "(reference-faithful objective)",
    )
    t.add_argument(
        "--mask-distill", type=float, default=0.0, metavar="W",
        help="opt-in self-distillation of the faithful mask path (round 4): "
        "pseudo-label masks are built for the training set from the frozen "
        "critic alone (LayerCAM + CAM-tuned CRF, pipelines/distill.py — no "
        "ground truth) and a soft-Dice term pushes the recon-diff signal "
        "into their support. 0 = off (reference-faithful objective)",
    )
    t.add_argument(
        "--no-shard-dataset", action="store_true",
        help="replicate the HBM-resident dataset on every device instead of "
        "sharding it along the mesh's data axis (sharding is automatic "
        "when dataset and batch divide by the mesh size — dataset "
        "capacity then scales with chips, train/step.py)",
    )
    t.add_argument(
        "--film", action="store_true",
        help="opt-in multi-stage value conditioning: a zero-initialized "
        "FiLM (gamma, beta) per decoder stage driven by the critic value, "
        "widening the single-scalar-concat bottleneck the reference uses "
        "(vae_nets.py:137). Structurally beyond the reference: film "
        "checkpoints cannot be exported to torch",
    )

    for name, help_ in (("eval", "evaluate source images (reference default mode)"),
                        ("inject", "injection ladder strips (reference: -inject)"),
                        ("evalsecond", "evaluate with second-VAE weights (reference: -evalsecond)")):
        e = sub.add_parser(name, help=help_)
        _add_common(e)
        _add_vae_weights(e)
        e.add_argument("--images", default=None, help="source images directory")
        e.add_argument("--out", default=None, help="output directory")
        if name == "inject":
            e.add_argument(
                "--values", default=None,
                help="comma-separated critic values to inject "
                "(default: 0,0.2,0.4,0.6,0.8,1 — reference vae_nets.py:31)",
            )

    v = sub.add_parser("video", help="mask-video pipeline (reference: -video [-thresh])")
    _add_common(v)
    _add_vae_weights(v)
    v.add_argument("--episode", default=None, help="episode dir with X.npy/Y.npy")
    v.add_argument(
        "--threshold", type=int, default=_D.mask.threshold,
        help="mask threshold on the normalized uint8 maps (default %(default)s "
        "— the reference's, tuned for the diff source; the measured "
        "SmoothGrad-logit saliency optimum is ~122, docs/artifacts/"
        "saliency.json)",
    )
    v.add_argument(
        "--quality", action="store_true",
        help="apply the measured-best mask chain in one flag: "
        "--mask-source saliency --saliency-method layercam "
        "--saliency-tta-flip --saliency-tta-shift 2 "
        "--crf-params 132,32,3.1,8,1.8,10 --threshold 64 "
        "(LayerCAM + {id,mirror}x{0,+-2px} TTA + CAM-tuned CRF — CRF IoU "
        "0.83-0.85 across episode seeds vs ~0.11 for the faithful "
        "recon-diff default, docs/artifacts/cam_tta_border_fix.json). "
        "Any of those flags passed explicitly (non-default) wins over "
        "the preset; the faithful reference chain stays the default "
        "without --quality",
    )
    v.add_argument("--sweep", action="store_true", help="threshold sweep 0..120 (reference: -thresh)")
    v.add_argument(
        "--sweep-range", default=None, metavar="LO:HI[:STEP]",
        help="override the sweep's thresholds (default: the reference's "
        "0..120 step 10). Implies --sweep. The SmoothGrad-logit saliency "
        "optimum sits at ~122 — past the reference range — so use e.g. "
        "--sweep-range 0:250:10 with those flags "
        "(docs/artifacts/saliency.json)",
    )
    v.add_argument("--no-crf", action="store_true")
    v.add_argument(
        "--crf-backend", default="auto", choices=["auto", "host", "device"],
        help="CRF refinement backend: 'host' = C++ permutohedral lattice, "
        "'device' = exact dense-CRF mean-field on the accelerator "
        "(MXU matmuls; no host bottleneck). Default 'auto' picks 'device' "
        "on a single-process accelerator run at <=128x128 (where it "
        "measured ~6x the lattice, and the sweep's lane-packed refinement "
        "~9x a sequential sweep) and 'host' otherwise "
        "(crf/policy.py)",
    )
    v.add_argument(
        "--crf-params", default=None, metavar="W1,ALPHA,BETA,W2,GAMMA,ITERS",
        help="explicit CRF parameter 6-tuple (default: the reference's "
        "22,12,3.1,8,1.8,10 — tuned for recon-diff masks). LayerCAM "
        "saliency masks want a much stronger bilateral term: "
        "132,32,3.1,8,1.8,10 lifts CRF IoU 0.58 -> 0.79-0.81 across "
        "episode seeds (docs/RESULTS.md); use with --mask-source saliency",
    )
    v.add_argument(
        "--crf-search", nargs="?", const="", default=None, metavar="GRID",
        help="run a real CRF hyperparameter search on the device backend "
        "(the reference's grid scaffold is degenerate, vae_utility.py:25-30) "
        "and refine with the best combination. Optional GRID like "
        "'w1=11,22,44;beta=1.55,3.1;w2=4,8' (missing keys = reference "
        "values; default grid spans w1/beta/w2 3x3x3)",
    )
    v.add_argument(
        "--mask-source", default="diff", choices=["diff", "saliency"],
        help="mask signal: 'diff' = the reference's VAE recon difference "
        "(faithful default, vae_utility.py:171-184), 'saliency' = critic "
        "input-gradient maps (ops/saliency.py) — no VAE in the mask path, "
        "measured ~2.4x the diff method's IoU on the synthetic benchmark "
        "(~4.6x with --saliency-logits --saliency-noise 0.08 "
        "--saliency-samples 8 --saliency-sigma 1.0; ~5x deterministic "
        "with --saliency-method layercam)",
    )
    v.add_argument(
        "--saliency-method", default="gradient",
        choices=["gradient", "layercam"],
        help="saliency estimator: 'gradient' = |d score / d x| at the "
        "pixels; 'layercam' = ReLU(dlogit/dA * A) over an intermediate "
        "activation, upsampled (LayerCAM, Jiang et al. 2021) — measured "
        "best mask quality (pipeline best-threshold IoU 0.524 on the "
        "chip vs SmoothGrad's 0.475; docs/artifacts/saliency.json) at "
        "deterministic single-pass cost. "
        "--saliency-noise/--saliency-samples apply to both methods "
        "(measured: noise buys layercam nothing); --saliency-logits only "
        "to gradient (layercam always differentiates the logit)",
    )
    v.add_argument(
        "--saliency-cam-block", type=int, default=1, metavar="K",
        help="layercam: which post-pool critic block to tap (0-3, spatial "
        "32/16/8/4; measured best 1)",
    )
    v.add_argument(
        "--saliency-cam-upsample", default="lanczos3",
        choices=["bilinear", "bicubic", "lanczos3", "nearest"],
        help="layercam: 16x16 -> 64x64 interpolation kernel (sharper "
        "kernels keep boundary detail: lanczos3 0.524 vs bilinear 0.514, "
        "consistent across episode seeds)",
    )
    v.add_argument(
        "--saliency-logits", action="store_true",
        help="saliency: differentiate the critic's pre-sigmoid logit "
        "(probability gradients vanish on saturated/confident frames)",
    )
    v.add_argument(
        "--saliency-samples", type=int, default=1, metavar="N",
        help="saliency: SmoothGrad sample count (average |grad| over N "
        "noisy input copies; 1 = deterministic single VJP)",
    )
    v.add_argument(
        "--saliency-noise", type=float, default=0.0, metavar="STD",
        help="saliency: SmoothGrad input-noise std in [0,1] pixel units "
        "(measured best 0.08 with --saliency-logits and 8 samples)",
    )
    v.add_argument(
        "--saliency-seed", type=int, default=0,
        help="saliency: base PRNG seed for the SmoothGrad noise streams",
    )
    v.add_argument(
        "--saliency-sigma", type=float, default=None, metavar="SIGMA",
        help="saliency: Gaussian smoothing sigma in pixels; 0 disables. "
        "Default is per-method: 1.5 for gradient (best deterministic), "
        "0 for layercam (blurring CAM maps costs IoU). With SmoothGrad "
        "the averaging already denoises — measured best 1.0",
    )
    v.add_argument(
        "--saliency-tta-flip", action="store_true",
        help="saliency: horizontal-flip test-time augmentation — keep the "
        "element-wise min of the map and the un-flipped map of the flipped "
        "frames (the critic is not flip-equivariant; the min keeps only "
        "support both views agree on). Measured with layercam: "
        "best-threshold IoU 0.524/0.522/0.526 -> 0.554/0.552/0.559 across "
        "three episode seeds at 2x the saliency-stage cost "
        "(docs/artifacts/cam_tta.json)",
    )
    v.add_argument(
        "--saliency-tta-shift", type=int, default=0, metavar="D",
        help="saliency: also min-combine the un-shifted maps of the +-D-px "
        "horizontally shifted views (composes with --saliency-tta-flip as "
        "the full {id,mirror}x{0,+-D} product; measured best stack: flip + "
        "D=2, 6 views -> thr-IoU 0.582/0.576/0.584 and CRF IoU "
        "0.841/0.828/0.844 across seeds at -41%% stage throughput; +-1 "
        "adds nothing, +-4 erodes, vertical shifts measured negative and "
        "are not offered — docs/artifacts/cam_tta_shift*.json)",
    )
    v.add_argument("--no-gif", action="store_true")
    v.add_argument(
        "--no-slice", action="store_true",
        help="use every episode frame instead of the reference's [100:5000:2] slice",
    )
    v.add_argument("--batch-size", type=int, default=512)
    v.add_argument(
        "--dtype", default="float32", choices=["float32", "bfloat16"],
        help="device compute dtype for the mask pipeline (bfloat16 ≈ 1.7× faster)",
    )
    v.add_argument(
        "--num-devices", type=int, default=None, metavar="N",
        help="shard the device stage over an N-chip data-parallel mesh "
        "(0 = all available devices; default: single device)",
    )

    d = sub.add_parser("dataset", help="build recon dataset (reference: -dataset)")
    _add_common(d)
    _add_vae_weights(d)
    d.add_argument("--source", default="synthetic")
    d.add_argument("--out", default=None, help="output .npz path")
    d.add_argument("--total-images", type=int, default=_D.train.total_images)

    s = sub.add_parser("second", help="train second VAE on recon dataset (reference: -second)")
    _add_common(s)
    s.add_argument("--dataset", dest="dataset_path", default=None)
    s.add_argument("--epochs", type=int, default=_D.train.epochs)
    s.add_argument("--batch-size", type=int, default=_D.train.batch_size)
    s.add_argument("--lr", type=float, default=_D.train.learning_rate)
    s.add_argument(
        "--correct-msssim", action="store_true",
        help="train with textbook MS-SSIM instead of the reference's quirky variant",
    )

    tc = sub.add_parser(
        "traincritic",
        help="train a framework-native critic from labeled episodes "
        "(new capability — the reference only consumes pretrained critics)",
    )
    _add_common(tc)
    tc.add_argument(
        "--episodes", default=None,
        help="directory of episode dirs (X.npy + Y.npy); labels derive from Y masks. "
        "Default: synthetic data",
    )
    tc.add_argument("--synthetic-frames", type=int, default=12800)
    tc.add_argument("--epochs", type=int, default=15)
    tc.add_argument("--batch-size", type=int, default=128)
    tc.add_argument("--lr", type=float, default=1e-3)
    tc.add_argument("--dropout", type=float, default=0.3)
    tc.add_argument(
        "--labels", choices=("soft", "binary"), default="soft",
        help="label target: 'soft' trunk-area fractions (default — the "
        "CAM-robust recipe, train/critic.py::soft_trunk_labels; round-5 "
        "finding: binary-label critics can hit 1.000 accuracy with "
        "degenerate LayerCAM) or 'binary' visibility (the bundled "
        "checkpoints' filename recipe, reference vae_parameters.py:38)")
    tc.add_argument(
        "--no-cam-health", action="store_true",
        help="skip the post-training no-GT LayerCAM health report "
        "(train/critic.py::critic_cam_health)")
    tc.add_argument(
        "--cam-select", type=int, default=1, metavar="N",
        help="train N candidate critics (seeds seed..seed+N-1) and keep "
        "the best by the no-GT deletion_drop health metric (CAM quality "
        "varies strongly across identical runs — round-5 finding, "
        "train/critic.py::train_critic_selected). N=1 (default) trains "
        "one critic; N=4 is the validated CAM-grade recipe")
    tc.add_argument(
        "--cam-health-target", type=float, default=None, metavar="D",
        help="with --cam-select N: stop as soon as a candidate's "
        "deletion_drop reaches D instead of always training the full pool "
        "(the retry recipe — a pool's argmax can still be a weak-CAM "
        "instance). D=0.65 is the measured CAM-GRADE bar: every instance "
        "above it beat the bundled critic's mask chain, none below it "
        "matched it, at a ~3%%/run hit rate — size N accordingly "
        "(train/critic.py::CAM_HEALTH_TARGET_STRICT, "
        "docs/artifacts/cam_health_target.json). If no candidate reaches "
        "D, the best is kept and a warning is printed")
    tc.add_argument("--out", default=None, help="output critic .npz path")

    x = sub.add_parser(
        "export",
        help="export framework weights as torch .pt state_dicts loadable by "
        "the reference (new capability — the interop inverse of ingestion)",
    )
    _add_common(x)
    _add_vae_weights(x)
    x.add_argument("--encoder-out", default=None, help="torch .pt path for the encoder state_dict")
    x.add_argument("--decoder-out", default=None, help="torch .pt path for the decoder state_dict")
    x.add_argument(
        "--critic-out", default=None,
        help="also export the critic (from --critic) as a torch .pt state_dict",
    )

    return ap


def _cfg(args) -> Config:
    return default_config(args.root)


def _critic(args, cfg: Config):
    from critic_vae_tpu.models.critic import load_critic

    path = args.critic or str(cfg.paths.resolve(cfg.paths.critic_path))
    return load_critic(path)


def _load_vae(args, cfg: Config, second: bool = False):
    import jax

    from critic_vae_tpu.models.vae import init_vae_params
    from critic_vae_tpu.pipelines.train import load_final_weights

    params, bn = init_vae_params(jax.random.key(args.seed))
    enc = args.encoder or str(
        cfg.paths.resolve(cfg.paths.second_encoder_path if second else cfg.paths.encoder_path)
    )
    dec = args.decoder or str(
        cfg.paths.resolve(cfg.paths.second_decoder_path if second else cfg.paths.decoder_path)
    )
    return load_final_weights(enc, dec, params, bn)


def _primary() -> bool:
    from critic_vae_tpu.parallel.distributed import is_primary

    return is_primary()


def _collect_training_set(args, cfg, critic_params) -> np.ndarray:
    from critic_vae_tpu.data.sampler import balanced_critic_sampler
    from critic_vae_tpu.data.sources import open_source

    quiet = not _primary()
    if not quiet:
        print(f"collecting balanced training frames from {args.source!r}...")
    dset = balanced_critic_sampler(
        open_source(args.source),
        critic_params,
        total_images=args.total_images,
        progress=(
            None if quiet
            else lambda n: print(f"total images = {n}", end="\r")
        ),
    )
    if not quiet:
        print(f"\ncollected {len(dset)} frames")
    return dset


def cmd_train(args) -> int:
    cfg = _cfg(args)
    critic_params = _critic(args, cfg)
    dset = _collect_training_set(args, cfg, critic_params)
    from critic_vae_tpu.pipelines.train import save_final_weights, train

    pseudo_masks = None
    if args.mask_distill > 0.0:
        from critic_vae_tpu.pipelines.distill import build_pseudo_masks

        if _primary():
            print("building pseudo-label masks (LayerCAM + CAM-tuned CRF)...")
        pseudo_masks = build_pseudo_masks(critic_params, dset)

    # multi-host: a fixed log dir must be identical across processes so the
    # primary's writes land where the launcher expects; the time-suffixed
    # default only matters single-process (each process derives its own, but
    # only the primary ever creates it — pipelines/train.py gates the logger)
    log_dir = args.log_dir or str(cfg.paths.resolve(f"logs/vae{str(time.time())[-5:]}"))
    state = train(
        critic_params,
        dset,
        epochs=args.epochs,
        batch_size=args.batch_size,
        learning_rate=args.lr,
        kld_weight=args.kld_weight,
        faithful_msssim=not args.correct_msssim,
        compute_dtype=args.dtype,
        seed=args.seed,
        value_consistency=args.value_consistency,
        mask_distill=args.mask_distill,
        pseudo_masks=pseudo_masks,
        shard_dataset=False if args.no_shard_dataset else "auto",
        film=args.film,
        log_dir=log_dir,
        checkpoint_dir=str(cfg.paths.resolve("checkpoints")),
        resume=not args.no_resume,
        log_images=args.log_images,
    )
    if _primary():
        enc = str(cfg.paths.resolve(cfg.paths.encoder_path))
        dec = str(cfg.paths.resolve(cfg.paths.decoder_path))
        save_final_weights(state, enc, dec)
        print(f"saved {enc} and {dec}")
    return 0


def _run_eval(args, second: bool, inject: bool) -> int:
    cfg = _cfg(args)
    pri = _primary()  # multi-host: all processes compute, only primary writes
    critic_params = _critic(args, cfg)
    vae_params, bn_state = _load_vae(args, cfg, second=second)
    from critic_vae_tpu.pipelines import evaluate as ev

    img_dir = args.images or str(cfg.paths.resolve(cfg.paths.source_images_path))
    images, files = ev.load_image_dir(img_dir)
    if pri:
        print(f"evaluating {len(files)} source images...")
    if inject:
        out_dir = args.out or str(cfg.paths.resolve(cfg.paths.inject_path))
        values = None
        if getattr(args, "values", None):
            import numpy as np

            values = np.asarray([float(v) for v in args.values.split(",")], np.float32)
        res = ev.inject_images(vae_params, bn_state, critic_params, images, values)
        paths = ev.save_inject_strips(res, images, out_dir) if pri else []
    else:
        out_dir = args.out or str(cfg.paths.resolve(cfg.paths.save_path))
        res = ev.evaluate_images(vae_params, bn_state, critic_params, images)
        paths = ev.save_eval_strips(res, images, out_dir) if pri else []
    if pri:
        print(f"wrote {len(paths)} strips to {out_dir}")
    return 0


def cmd_eval(args) -> int:
    return _run_eval(args, second=False, inject=False)


def cmd_inject(args) -> int:
    return _run_eval(args, second=False, inject=True)


def cmd_evalsecond(args) -> int:
    return _run_eval(args, second=True, inject=False)


_QUALITY_PRESET = {
    # the measured-best chain (docs/artifacts/cam_tta_border_fix.json);
    # keys are argparse dests, values are (parser_default, preset_value)
    "mask_source": ("diff", "saliency"),
    "saliency_method": ("gradient", "layercam"),
    "saliency_tta_flip": (False, True),
    "saliency_tta_shift": (0, 2),
    "crf_params": (None, "132,32,3.1,8,1.8,10"),
    "threshold": (50, 64),
}


def _apply_quality_preset(args) -> None:
    """Expand ``--quality`` into the measured-best chain's flags.

    A flag the user set explicitly (i.e. whose parsed value differs from
    the parser default) wins over the preset — so e.g.
    ``--quality --saliency-tta-shift 3`` runs the preset with a wider
    shift radius. Passing a preset flag AT its default value is
    indistinguishable from omitting it and gets overridden; the
    composition is documented in the --quality help text.
    """
    for dest, (default, preset) in _QUALITY_PRESET.items():
        if dest == "crf_params" and args.crf_search is not None:
            continue  # the search finds its own params; don't pre-pin them
        if getattr(args, dest) == default:
            setattr(args, dest, preset)


def cmd_video(args) -> int:
    cfg = _cfg(args)
    if args.quality:
        _apply_quality_preset(args)
    # parse BEFORE any weight loading / device work — fail fast on a typo
    if args.sweep_range is not None:
        args.sweep = True
        sweep_thresholds = _parse_sweep_range(args.sweep_range)
    else:
        sweep_thresholds = None
    pri = _primary()  # device stages run on all processes; only primary writes
    critic_params = _critic(args, cfg)
    vae_params, bn_state = _load_vae(args, cfg)
    from critic_vae_tpu.data.episode import load_episode
    from critic_vae_tpu.pipelines import video as vid

    episode_dir = args.episode or str(cfg.paths.resolve(cfg.paths.minerl_episode_path))
    ep_slice = None if args.no_slice else cfg.mask.episode_slice
    frames, gt = load_episode(episode_dir, ep_slice)
    if len(frames) == 0:
        print(
            f"error: episode slice {ep_slice} selects 0 of the episode's frames; "
            "try --no-slice", file=sys.stderr,
        )
        return 1
    if pri:
        print(f"processing {len(frames)} frames...")
    if gt is None:
        if args.sweep or args.crf_search is not None:
            print(
                "error: the episode has no Y.npy ground truth — "
                "--sweep/--crf-search need IoU scoring", file=sys.stderr,
            )
            return 1
        if pri:
            print("no Y.npy ground truth: IoU scoring and bin_info are skipped")

    if args.sweep and args.crf_search is not None:
        print("error: --sweep and --crf-search are mutually exclusive "
              "(the sweep varies the threshold, the search varies CRF "
              "parameters at one threshold)", file=sys.stderr)
        return 1
    if args.crf_params is not None and args.crf_search is not None:
        print("error: --crf-params and --crf-search are mutually exclusive "
              "(the search finds parameters; pass its winner back via "
              "--crf-params)", file=sys.stderr)
        return 1
    # parse the search grid / explicit params BEFORE the episode pass — a
    # typo'd spec must not cost minutes of device work
    search_grid = (
        _parse_crf_grid(args.crf_search) if args.crf_search is not None else None
    )
    crf_param_kw = (
        {"crf_params": _parse_crf_params(args.crf_params)}
        if args.crf_params is not None else {}
    )

    from critic_vae_tpu.utils.profiling import profile_trace

    saliency_opts = {
        "logits": args.saliency_logits,
        "samples": args.saliency_samples,
        "noise": args.saliency_noise,
        "seed": args.saliency_seed,
        "sigma": args.saliency_sigma,
        "method": args.saliency_method,
        "cam_block": args.saliency_cam_block,
        "cam_upsample": args.saliency_cam_upsample,
        "tta_flip": args.saliency_tta_flip,
        "tta_shift": args.saliency_tta_shift,
    }

    mesh = None
    if args.num_devices is not None:
        from critic_vae_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(args.num_devices)
        if pri:
            print(f"sharding the device stage over {mesh.devices.size} device(s)")

    # resolve 'auto' (and validate an explicit 'device') against the actual
    # episode resolution + backend — crf/policy.py (VERDICT r3 #7/#8)
    if not args.no_crf or args.crf_search is not None:
        from critic_vae_tpu.crf.policy import resolve_crf_backend

        try:
            resolved_backend = resolve_crf_backend(
                args.crf_backend, frames.shape[1], frames.shape[2],
            )
        except ValueError as e:
            print(f"error: {e}", file=sys.stderr)
            return 1
        if pri and args.crf_backend == "auto":
            print(f"crf backend: {resolved_backend} (auto)")
        args.crf_backend = resolved_backend
    elif args.crf_backend == "auto":
        args.crf_backend = "host"  # inert: --no-crf runs no refinement

    if args.sweep:
        if pri:
            print("testing thresholds (thr):")
        with profile_trace(args.profile):
            results = vid.threshold_sweep(
                vae_params, bn_state, critic_params, frames, gt,
                sweep_thresholds or cfg.mask.threshold_sweep,
                run_crf=not args.no_crf,
                batch_size=args.batch_size, compute_dtype=args.dtype,
                mesh=mesh, crf_backend=args.crf_backend,
                mask_source=args.mask_source, saliency_opts=saliency_opts,
                **crf_param_kw,
            )
        if pri:
            for r in results:
                print(f"thr={r['threshold']}, thr_iou={r['thr_iou']}, crf_iou={r['crf_iou']}")
        return 0

    with profile_trace(args.profile):
        result = vid.eval_episode(
            vae_params, bn_state, critic_params, frames, gt,
            threshold=args.threshold,
            run_crf=not args.no_crf and args.crf_search is None,
            batch_size=args.batch_size, compute_dtype=args.dtype,
            mesh=mesh, crf_backend=args.crf_backend,
            recons_u8=True,  # panels consume uint8; 4x less device fetch
            with_recons=not args.no_gif,  # recons feed panels only
            mask_source=args.mask_source, saliency_opts=saliency_opts,
            **crf_param_kw,
        )

    if args.crf_search is not None:
        import dataclasses

        from critic_vae_tpu.crf.device import crf_param_search
        from critic_vae_tpu.ops.iou import iou as iou_fn

        if pri:
            print(f"searching CRF parameters ({'default grid' if not args.crf_search else args.crf_search})...")
        best_masks, search = crf_param_search(
            frames, result.thr_masks, gt, search_grid, mesh=mesh
        )
        if pri:
            for score, p in search:
                print(f"  iou={score:.3f}  (w1={p[0]}, alpha={p[1]}, beta={p[2]}, "
                      f"w2={p[3]}, gamma={p[4]}, iters={p[5]})")
        result = dataclasses.replace(
            result, crf_masks=best_masks, crf_iou=iou_fn(gt, best_masks)
        )

    if gt is not None and pri:
        print(f"thr_iou={result.thr_iou}")
        print(f"crf_iou={result.crf_iou}")

        diag = vid.bin_diagnostics(result.preds, gt, result.thr_masks)
        binfo = str(cfg.paths.resolve("bin_info_vae1.txt"))
        vid.write_bin_info(diag, binfo, total_frames=len(frames))

    if not args.no_gif and pri:
        from critic_vae_tpu.viz.gif import write_gif

        strips = vid.compose_frames(frames, result, gt, args.threshold)
        out = str(cfg.paths.resolve(
            os.path.join(cfg.paths.video_path, f"video-threshold={args.threshold}.gif")
        ))
        print("creating video...")
        write_gif(strips, out)
        print(f"wrote {out}")
    return 0


def _parse_sweep_range(spec: str) -> list:
    """Parse 'LO:HI[:STEP]' into a threshold list (HI inclusive, uint8 range)."""
    parts = spec.split(":")
    try:
        lo, hi = int(parts[0]), int(parts[1])
        step = int(parts[2]) if len(parts) > 2 else 10
        if len(parts) > 3:
            raise ValueError
    except (ValueError, IndexError):
        raise SystemExit(
            f"bad --sweep-range {spec!r}; expected LO:HI or LO:HI:STEP "
            "(integers)"
        )
    if not (0 <= lo <= hi <= 255) or step < 1:
        raise SystemExit(
            f"bad --sweep-range {spec!r}; need 0 <= LO <= HI <= 255 "
            "(thresholds apply to uint8 maps) and STEP >= 1"
        )
    return list(range(lo, hi + 1, step))


def _parse_crf_params(spec: str) -> tuple:
    """Parse 'w1,alpha,beta,w2,gamma,iters' into the CRF 6-tuple."""
    parts = [p.strip() for p in spec.split(",")]
    if len(parts) != 6:
        raise SystemExit(
            f"bad --crf-params {spec!r}: expected 6 comma-separated values "
            "(w1,alpha,beta,w2,gamma,iters)"
        )
    try:
        return tuple([float(v) for v in parts[:5]] + [int(parts[5])])
    except ValueError:
        raise SystemExit(
            f"bad --crf-params {spec!r}: first five must be numbers, "
            "iters an integer"
        )


def _parse_crf_grid(spec: str) -> dict:
    """Parse 'w1=11,22;beta=1.55,3.1' into a crf_param_search grid.
    Empty spec = the default 3x3x3 exploration grid over (w1, beta, w2)."""
    if not spec:
        return {"w1": [11.0, 22.0, 44.0], "beta": [1.55, 3.1, 6.2],
                "w2": [4.0, 8.0, 16.0]}
    valid = {"w1", "alpha", "beta", "w2", "gamma", "iters"}
    grid = {}
    for part in spec.split(";"):
        key, _, vals = part.partition("=")
        key = key.strip()
        if key not in valid or not vals:
            raise SystemExit(
                f"bad --crf-search component {part!r}; expected key=v1,v2,... "
                f"with key in {sorted(valid)}"
            )
        cast = int if key == "iters" else float
        try:
            grid[key] = [cast(v) for v in vals.split(",")]
        except ValueError:
            raise SystemExit(
                f"bad --crf-search component {part!r}; values must be "
                f"{'integers' if key == 'iters' else 'numbers'}"
            )
    return grid


def cmd_dataset(args) -> int:
    cfg = _cfg(args)
    critic_params = _critic(args, cfg)
    vae_params, bn_state = _load_vae(args, cfg)
    from critic_vae_tpu.data.sources import open_source
    from critic_vae_tpu.pipelines.dataset import build_recon_dataset, save_dataset

    dset = build_recon_dataset(
        open_source(args.source), critic_params, vae_params, bn_state,
        total_images=args.total_images,
    )
    out = args.out or str(cfg.paths.resolve(cfg.paths.save_dataset_path))
    if _primary():  # multi-host: save_dataset is a non-atomic savez —
        # concurrent same-path writers would corrupt the artifact
        save_dataset(out, dset)
        print(f"saved {len(dset)} recon frames to {out}")
    return 0


def cmd_second(args) -> int:
    cfg = _cfg(args)
    critic_params = _critic(args, cfg)
    from critic_vae_tpu.pipelines.dataset import load_dataset
    from critic_vae_tpu.pipelines.train import save_final_weights, train

    path = args.dataset_path or str(cfg.paths.resolve(cfg.paths.save_dataset_path))
    if _primary():
        print("training second vae...")
    recon_dset = load_dataset(path)
    state = train(
        critic_params, recon_dset,
        epochs=args.epochs, batch_size=args.batch_size, learning_rate=args.lr,
        faithful_msssim=not args.correct_msssim,
        seed=args.seed, log_dir=None, checkpoint_dir=None, resume=False,
    )
    if _primary():  # multi-host: train() is collective, weights replicated
        enc = str(cfg.paths.resolve(cfg.paths.second_encoder_path))
        dec = str(cfg.paths.resolve(cfg.paths.second_decoder_path))
        save_final_weights(state, enc, dec)
        print(f"saved {enc} and {dec}")
    return 0


def cmd_traincritic(args) -> int:
    cfg = _cfg(args)
    import glob

    import numpy as np

    from critic_vae_tpu.data.episode import load_episode
    from critic_vae_tpu.models.critic import save_critic
    from critic_vae_tpu.train.critic import (
        critic_accuracy,
        labels_from_masks,
        train_critic,
    )

    if args.episodes:
        frames_list, gt_list = [], []
        dirs = sorted(
            d for d in glob.glob(os.path.join(args.episodes, "*"))
            if os.path.isfile(os.path.join(d, "X.npy"))
        )
        if os.path.isfile(os.path.join(args.episodes, "X.npy")):
            dirs.insert(0, args.episodes)
        if not dirs:
            print(f"error: no episodes (X.npy/Y.npy) under {args.episodes}", file=sys.stderr)
            return 1
        for d in dirs:
            f, g = load_episode(d, episode_slice=None)
            if g is None:  # critic training needs labels
                print(f"skipping {d}: no Y.npy ground truth", file=sys.stderr)
                continue
            frames_list.append(f)
            gt_list.append(g)
        if not frames_list:
            print("error: no episode with Y.npy ground truth found — "
                  "traincritic needs labeled frames", file=sys.stderr)
            return 1
        frames = np.concatenate(frames_list)
        gt = np.concatenate(gt_list)
    else:
        from critic_vae_tpu.data.synthetic import generate_frames

        frames, gt = generate_frames(args.synthetic_frames, seed=args.seed)
    bin_labels = labels_from_masks(gt)
    if args.labels == "soft":
        from critic_vae_tpu.train.critic import soft_trunk_labels

        labels = soft_trunk_labels(gt)
    else:
        labels = bin_labels
    if _primary():
        print(f"training critic on {len(frames)} frames "
              f"({bin_labels.mean():.0%} positive, {args.labels} labels"
              + (f", best-of-{args.cam_select} by CAM health"
                 if args.cam_select > 1 else "") + ")...")
    health = None
    if args.cam_select > 1:
        from critic_vae_tpu.train.critic import train_critic_selected

        params, health, reports = train_critic_selected(
            frames, labels, candidates=args.cam_select,
            base_seed=args.seed, epochs=args.epochs,
            batch_size=args.batch_size, learning_rate=args.lr,
            dropout_rate=args.dropout,
            health_target=args.cam_health_target,
        )
        loss = next(r["final_loss"] for r in reports
                    if r["seed"] == health["selected_seed"])
        if health.get("health_target_met") is False and _primary():
            print(f"WARNING: no candidate reached --cam-health-target "
                  f"{args.cam_health_target} within {args.cam_select} seeds "
                  f"(best deletion_drop {health['deletion_drop']:.3f}); "
                  f"keeping the best — consider rerunning with a later "
                  f"--seed or a larger --cam-select")
    else:
        params, loss = train_critic(
            frames, labels, epochs=args.epochs, batch_size=args.batch_size,
            learning_rate=args.lr, dropout_rate=args.dropout, seed=args.seed,
        )
    acc = critic_accuracy(params, frames, bin_labels)
    if health is None and not args.no_cam_health:
        from critic_vae_tpu.train.critic import critic_cam_health

        health = critic_cam_health(params, frames)
    if _primary():  # multi-host: only the primary persists the weights
        out = args.out or str(cfg.paths.resolve("saved-networks/critic.npz"))
        os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
        save_critic(out, params)
        print(f"final loss={loss:.4f} train acc={acc:.3f}; saved {out}")
        if health is not None:
            from critic_vae_tpu.train.critic import (
                CAM_HEALTH_MIN_DELETION_DROP,
            )

            print("cam health (no-GT, train/critic.py::critic_cam_health): "
                  + " ".join(f"{k}={v:.4g}" for k, v in health.items()))
            if health["deletion_drop"] < CAM_HEALTH_MIN_DELETION_DROP:
                print(
                    f"WARNING: deletion_drop "
                    f"{health['deletion_drop']:.3f} < "
                    f"{CAM_HEALTH_MIN_DELETION_DROP} — this critic's "
                    f"LayerCAM localization looks DEGENERATE (accuracy "
                    f"does not predict CAM quality; docs/RESULTS.md round "
                    f"5). The saliency mask chain (`video --quality`, "
                    f"mask distillation) will underperform with it; "
                    f"retrain with --labels soft or another --seed.",
                    file=sys.stderr,
                )
    return 0


def cmd_export(args) -> int:
    cfg = _cfg(args)
    if not _primary():  # multi-host: export is pure IO, no collectives
        return 0
    from critic_vae_tpu.io.legacy_pt import save_torch_pt

    wrote = []
    if args.encoder_out or args.decoder_out:
        if not (args.encoder_out and args.decoder_out):
            print("error: --encoder-out and --decoder-out go together", file=sys.stderr)
            return 1
        from critic_vae_tpu.models.vae import vae_state_dicts_to_torch

        vae_params, bn_state = _load_vae(args, cfg)
        enc_sd, dec_sd = vae_state_dicts_to_torch(vae_params, bn_state)
        save_torch_pt(args.encoder_out, enc_sd)
        save_torch_pt(args.decoder_out, dec_sd)
        wrote += [args.encoder_out, args.decoder_out]
    if args.critic_out:
        from critic_vae_tpu.models.critic import critic_state_dict_to_torch

        save_torch_pt(args.critic_out, critic_state_dict_to_torch(_critic(args, cfg)))
        wrote.append(args.critic_out)
    if not wrote:
        print("error: nothing to export (pass --encoder-out/--decoder-out "
              "and/or --critic-out)", file=sys.stderr)
        return 1
    print(f"exported {', '.join(wrote)}")
    return 0


COMMANDS = {
    "train": cmd_train,
    "export": cmd_export,
    "traincritic": cmd_traincritic,
    "eval": cmd_eval,
    "inject": cmd_inject,
    "evalsecond": cmd_evalsecond,
    "video": cmd_video,
    "dataset": cmd_dataset,
    "second": cmd_second,
}


def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache: repeated CLI invocations skip the
    20-40 s TPU compile (the reference pays torch's per-process warmup every
    run; here recompiles are one-time per program shape)."""
    import jax

    cache_dir = os.environ.get(
        "CRITIC_VAE_TPU_JAX_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "critic_vae_tpu", "jax"),
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimization; never fail the CLI over it


def main(argv: Optional[list] = None) -> int:
    args = build_parser().parse_args(argv)
    # Multi-host: one jax.distributed.initialize per process BEFORE any
    # backend touch (greenfield — the reference is single-process,
    # vae_parameters.py:2). No-op unless a coordinator is configured; see
    # parallel/distributed.py for the detection rules.
    from critic_vae_tpu.parallel.distributed import init_distributed, is_primary

    if init_distributed():
        import jax

        if is_primary():
            print(
                f"multi-host: {jax.process_count()} processes, "
                f"{len(jax.devices())} devices"
            )
    _enable_compilation_cache()
    return COMMANDS[args.mode](args)


if __name__ == "__main__":
    sys.exit(main())
