"""CLI subcommand tests — every reference mode, in-process, tiny workloads."""

import os
import shutil

import numpy as np
import pytest

from critic_vae_tpu.cli import main
from tests.conftest import CRITIC_PT, REFERENCE, requires_reference


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    """A scratch --root with critic weights, a few source images, and a tiny
    synthetic episode."""
    root = tmp_path_factory.mktemp("cliroot")
    (root / "saved-networks").mkdir()
    shutil.copy(CRITIC_PT, root / "saved-networks" / os.path.basename(CRITIC_PT))
    src = root / "source-images"
    src.mkdir()
    for name in sorted(os.listdir(f"{REFERENCE}/source-images"))[:4]:
        shutil.copy(f"{REFERENCE}/source-images/{name}", src / name)
    from critic_vae_tpu.data.synthetic import generate_episode

    generate_episode(str(root / "minerl-episode"), num_frames=8, seed=0)
    return str(root)


def _run(args):
    assert main(args) == 0


@requires_reference
def test_full_mode_matrix(workspace):
    """train → eval → inject → video → video --sweep → dataset → second →
    evalsecond: the complete reference mode surface (vae.py:23-31)."""
    critic = os.path.join(workspace, "saved-networks", os.path.basename(CRITIC_PT))
    base = ["--root", workspace, "--critic", critic]

    _run(["train", *base, "--source", "synthetic:2:48", "--epochs", "1",
          "--batch-size", "8", "--total-images", "64", "--no-resume"])
    assert os.path.exists(os.path.join(workspace, "saved-networks/vae_encoder.ckpt"))
    assert os.path.exists(os.path.join(workspace, "saved-networks/vae_decoder.ckpt"))

    _run(["eval", *base])
    assert os.path.exists(os.path.join(workspace, "images/image-000.png"))

    _run(["inject", *base])
    assert os.path.exists(os.path.join(workspace, "inject/image-000.png"))

    _run(["inject", *base, "--values", "0,0.5,1",
          "--out", os.path.join(workspace, "inject-custom")])
    from PIL import Image

    img = Image.open(os.path.join(workspace, "inject-custom/image-000.png"))
    assert img.size == (64 * 4, 64)  # orig + 3 injected values

    _run(["video", *base, "--episode", os.path.join(workspace, "minerl-episode"),
          "--batch-size", "8", "--no-crf", "--no-slice"])
    assert os.path.exists(os.path.join(workspace, "bin_info_vae1.txt"))
    assert os.path.exists(os.path.join(workspace, "videos/video-threshold=50.gif"))

    # sharded serving: same pipeline over the 8-device mesh must produce an
    # identical bin_info (identical preds + masks end-to-end) — SURVEY §2.3
    binfo = open(os.path.join(workspace, "bin_info_vae1.txt")).read()
    _run(["video", *base, "--episode", os.path.join(workspace, "minerl-episode"),
          "--batch-size", "8", "--no-crf", "--no-slice", "--no-gif",
          "--num-devices", "8"])
    assert open(os.path.join(workspace, "bin_info_vae1.txt")).read() == binfo

    _run(["video", *base, "--episode", os.path.join(workspace, "minerl-episode"),
          "--batch-size", "8", "--no-crf", "--no-slice", "--sweep"])

    # on-device exact CRF refinement (crf/device.py) through the CLI
    _run(["video", *base, "--episode", os.path.join(workspace, "minerl-episode"),
          "--batch-size", "8", "--no-slice", "--no-gif",
          "--crf-backend", "device"])

    # CRF hyperparameter search through the CLI (tiny 2-combo grid)
    _run(["video", *base, "--episode", os.path.join(workspace, "minerl-episode"),
          "--batch-size", "8", "--no-slice", "--no-gif",
          "--crf-search", "iters=2,5"])

    # critic-gradient saliency mask source (beyond-reference, ops/saliency.py)
    _run(["video", *base, "--episode", os.path.join(workspace, "minerl-episode"),
          "--batch-size", "8", "--no-slice", "--no-crf",
          "--mask-source", "saliency"])

    # SmoothGrad-logit options + extended sweep range (the measured optimum
    # sits past the reference's 0..120 — --sweep-range reaches it)
    _run(["video", *base, "--episode", os.path.join(workspace, "minerl-episode"),
          "--batch-size", "8", "--no-slice", "--no-crf",
          "--mask-source", "saliency", "--saliency-logits",
          "--saliency-noise", "0.08", "--saliency-samples", "2",
          "--saliency-sigma", "1.0", "--sweep-range", "100:140:20"])

    # LayerCAM saliency method (measured best mask quality, deterministic)
    # + explicit CRF params (the CAM-tuned bilateral weight, docs/RESULTS.md)
    _run(["video", *base, "--episode", os.path.join(workspace, "minerl-episode"),
          "--batch-size", "8", "--no-slice", "--no-gif",
          "--mask-source", "saliency", "--saliency-method", "layercam",
          "--crf-backend", "device", "--crf-params", "88,12,3.1,8,1.8,10"])

    dset_path = os.path.join(workspace, "recon.npz")
    _run(["dataset", *base, "--source", "synthetic:1:32", "--out", dset_path,
          "--total-images", "32"])
    assert os.path.exists(dset_path)
    with np.load(dset_path) as d:
        assert d["frames"].ndim == 4

    _run(["second", *base, "--dataset", dset_path, "--epochs", "1",
          "--batch-size", "8"])
    assert os.path.exists(os.path.join(workspace, "vae2_encoder.ckpt"))

    _run(["evalsecond", *base, "--out", os.path.join(workspace, "images2")])
    assert os.path.exists(os.path.join(workspace, "images2/image-000.png"))


def test_quality_preset_expansion():
    """--quality expands to the measured-best chain; explicit non-default
    flags win; --crf-search suppresses the params pin (VERDICT r4 #6)."""
    from critic_vae_tpu.cli import _apply_quality_preset, build_parser

    p = build_parser()
    args = p.parse_args(["video", "--quality"])
    _apply_quality_preset(args)
    assert args.mask_source == "saliency"
    assert args.saliency_method == "layercam"
    assert args.saliency_tta_flip and args.saliency_tta_shift == 2
    assert args.crf_params == "132,32,3.1,8,1.8,10"
    assert args.threshold == 64

    # explicit flags override the preset
    args = p.parse_args(["video", "--quality", "--saliency-tta-shift", "3",
                         "--threshold", "80"])
    _apply_quality_preset(args)
    assert args.saliency_tta_shift == 3 and args.threshold == 80
    assert args.mask_source == "saliency"  # rest of the preset intact

    # --crf-search keeps searching instead of pinning the tuned params
    args = p.parse_args(["video", "--quality", "--crf-search"])
    _apply_quality_preset(args)
    assert args.crf_params is None


def test_quality_preset_end_to_end(workspace, tmp_path):
    """video --quality runs the full preset chain on a tiny episode."""
    critic = os.path.join(workspace, "saved-networks", os.path.basename(CRITIC_PT))
    root = str(tmp_path)
    base = ["--root", root, "--critic", critic]
    _run(["train", *base, "--source", "synthetic:1:32", "--epochs", "1",
          "--batch-size", "8", "--total-images", "32", "--no-resume"])
    _run(["video", *base,
          "--episode", os.path.join(workspace, "minerl-episode"),
          "--batch-size", "8", "--no-slice", "--no-gif", "--quality"])
    assert os.path.exists(os.path.join(root, "bin_info_vae1.txt"))


def test_unknown_mode_fails():
    with pytest.raises(SystemExit):
        main(["definitely-not-a-mode"])


def test_parse_crf_params():
    from critic_vae_tpu.cli import _parse_crf_params

    assert _parse_crf_params("88,12,3.1,8,1.8,10") == (88.0, 12.0, 3.1, 8.0,
                                                       1.8, 10)
    for bad in ("88,12,3.1,8,1.8", "a,b,c,d,e,f", "88,12,3.1,8,1.8,10.5",
                "88 12 3.1 8 1.8 10"):
        with pytest.raises(SystemExit):
            _parse_crf_params(bad)


def test_parse_sweep_range():
    from critic_vae_tpu.cli import _parse_sweep_range

    assert _parse_sweep_range("0:250:10") == list(range(0, 251, 10))
    assert _parse_sweep_range("100:140:20") == [100, 120, 140]
    assert _parse_sweep_range("50:52") == [50]  # default step 10
    for bad in ("250:0", "0:300", "-5:50", "0:50:0", "a:b", "1:2:3:4", "7"):
        with pytest.raises(SystemExit):
            _parse_sweep_range(bad)


@requires_reference
def test_non_primary_process_writes_nothing(tmp_path, monkeypatch):
    """Round-3 multi-host gating: on a non-primary host (is_primary False),
    every artifact-writing command computes but writes NO files —
    save_dataset is a non-atomic savez, so two hosts writing the same path
    would corrupt it (pipelines gate train/video; cli gates the rest)."""
    import jax

    import critic_vae_tpu.parallel.distributed as dist
    from critic_vae_tpu.pipelines.dataset import save_dataset
    from critic_vae_tpu.pipelines.train import save_final_weights
    from critic_vae_tpu.train.step import init_train_state

    root = tmp_path / "root"
    nets = root / "saved-networks"
    nets.mkdir(parents=True)
    shutil.copy(CRITIC_PT, nets / os.path.basename(CRITIC_PT))
    state, _ = init_train_state(jax.random.key(0))
    save_final_weights(state, str(nets / "vae_encoder.ckpt"),
                       str(nets / "vae_decoder.ckpt"))
    src = root / "source-images"
    src.mkdir()
    for name in sorted(os.listdir(f"{REFERENCE}/source-images"))[:2]:
        shutil.copy(f"{REFERENCE}/source-images/{name}", src / name)
    dset_path = root / "recon.npz"
    save_dataset(str(dset_path), np.zeros((16, 64, 64, 3), np.float32))

    monkeypatch.setattr(dist, "is_primary", lambda: False)
    critic = str(nets / os.path.basename(CRITIC_PT))
    base = ["--root", str(root), "--critic", critic]

    def tree(p):
        return {
            os.path.join(dp, f)
            for dp, _, fs in os.walk(p) for f in fs
        }

    before = tree(root)
    _run(["eval", *base])
    _run(["inject", *base])
    _run(["dataset", *base, "--source", "synthetic:1:16",
          "--total-images", "16", "--out", str(root / "recon2.npz")])
    _run(["second", *base, "--dataset", str(dset_path), "--epochs", "1",
          "--batch-size", "8"])
    _run(["traincritic", *base, "--synthetic-frames", "32", "--epochs", "1",
          "--batch-size", "16", "--out", str(root / "critic2.npz")])
    _run(["export", *base, "--critic-out", str(root / "critic.pt")])
    assert tree(root) == before


@requires_reference
def test_missing_weights_error_is_loud(workspace, tmp_path):
    """eval without trained weights must raise, not continue with random
    weights like the reference (vae_utility.py:353-357)."""
    critic = os.path.join(workspace, "saved-networks", os.path.basename(CRITIC_PT))
    with pytest.raises(FileNotFoundError):
        main(["eval", "--root", str(tmp_path), "--critic", critic,
              "--images", os.path.join(workspace, "source-images")])


@requires_reference
def test_traincritic_cli(tmp_path, workspace):
    """traincritic trains a native critic and eval can consume the .npz."""
    out = os.path.join(str(tmp_path), "critic.npz")
    _run(["traincritic", "--root", str(tmp_path), "--synthetic-frames", "256",
          "--epochs", "2", "--batch-size", "64", "--out", out])
    assert os.path.exists(out)
    # the trained .npz loads through the same load path as .pt critics
    from critic_vae_tpu.models.critic import load_critic

    params = load_critic(out)
    assert params["conv0_w"].shape == (3, 3, 3, 8)


@requires_reference
def test_video_without_ground_truth(workspace, tmp_path):
    """An episode with X.npy but no Y.npy runs the mask pipeline end-to-end
    (4-panel strips, no IoU/bin_info) — unlabeled-footage support the
    reference lacks (its loader assumes Y.npy, vae_utility.py:70-82)."""
    import shutil as _sh

    src = os.path.join(workspace, "minerl-episode")
    nogt = str(tmp_path / "ep-nogt")
    os.makedirs(nogt)
    _sh.copy(os.path.join(src, "X.npy"), nogt)

    critic = os.path.join(workspace, "saved-networks", os.path.basename(CRITIC_PT))
    root = str(tmp_path)
    base = ["--root", root, "--critic", critic]
    _run(["train", *base, "--source", "synthetic:1:32", "--epochs", "1",
          "--batch-size", "8", "--total-images", "32", "--no-resume"])

    _run(["video", *base, "--episode", nogt, "--batch-size", "8",
          "--no-slice", "--no-crf"])
    assert not os.path.exists(os.path.join(root, "bin_info_vae1.txt"))
    gif = os.path.join(root, "videos/video-threshold=50.gif")
    from PIL import Image

    with Image.open(gif) as im:
        # 6-panel layout: masks rendered, no gt column
        assert im.size == (64 * 6, 128)

    # sweep needs gt -> clean error
    assert main(["video", *base, "--episode", nogt, "--batch-size", "8",
                 "--no-slice", "--sweep"]) == 1


@requires_reference
def test_real_episode_runbook_default_paths(workspace, capsys):
    """The real-episode runbook (README 'When the real episode appears'):
    once X.npy/Y.npy exist at the reference's exact location, ONE command —
    ``video`` with no --episode flag — must resolve the default
    ``minerl-episode/`` path, apply the reference's [100:5000:2] slice
    (vae_utility.py:70-82), and produce thr/CRF IoU, bin_info, and the GIF.
    Pre-flighted here with a synthetic episode in that exact layout."""
    import shutil

    from critic_vae_tpu.data.synthetic import generate_episode

    root = os.path.join(workspace, "runbook")
    os.makedirs(os.path.join(root, "saved-networks"))
    shutil.copy(CRITIC_PT, os.path.join(root, "saved-networks",
                                        os.path.basename(CRITIC_PT)))
    if not os.path.exists(os.path.join(workspace, "saved-networks",
                                       "vae_encoder.ckpt")):
        # standalone (-k) run: the mode-matrix test hasn't trained weights
        import jax

        from critic_vae_tpu.pipelines.train import save_final_weights
        from critic_vae_tpu.train.step import init_train_state

        state, _ = init_train_state(jax.random.key(0))
        save_final_weights(
            state,
            os.path.join(workspace, "saved-networks", "vae_encoder.ckpt"),
            os.path.join(workspace, "saved-networks", "vae_decoder.ckpt"),
        )
    for name in ("vae_encoder.ckpt", "vae_decoder.ckpt"):
        shutil.copy(os.path.join(workspace, "saved-networks", name),
                    os.path.join(root, "saved-networks", name))
    # 110 frames -> the [100:5000:2] slice selects 5, like the real 1200
    # -> 550 (proportionally)
    generate_episode(os.path.join(root, "minerl-episode"), num_frames=110,
                     seed=1)
    _run(["video", "--root", root, "--critic",
          os.path.join(root, "saved-networks", os.path.basename(CRITIC_PT)),
          "--batch-size", "8"])
    out = capsys.readouterr().out
    assert "processing 5 frames" in out
    assert "thr_iou=" in out and "crf_iou=" in out
    assert os.path.exists(os.path.join(root, "bin_info_vae1.txt"))
    assert os.path.exists(os.path.join(root, "videos/video-threshold=50.gif"))


@requires_reference
def test_traincritic_soft_labels_and_cam_select(tmp_path, capsys):
    """Round-5 CAM-robust recipe surface: soft labels are the default, the
    no-GT health report prints, and --cam-select N trains N candidates and
    keeps the argmax-deletion_drop one (train/critic.py)."""
    out = os.path.join(str(tmp_path), "critic-sel.npz")
    _run(["traincritic", "--root", str(tmp_path), "--synthetic-frames",
          "128", "--epochs", "1", "--batch-size", "32", "--cam-select", "2",
          "--out", out])
    assert os.path.exists(out)
    text = capsys.readouterr().out
    assert "soft labels" in text
    assert "cam health" in text
    assert "selected_seed" in text
    # binary labels remain available (the reference checkpoints' recipe)
    out2 = os.path.join(str(tmp_path), "critic-bin.npz")
    _run(["traincritic", "--root", str(tmp_path), "--synthetic-frames",
          "128", "--epochs", "1", "--batch-size", "32", "--labels",
          "binary", "--no-cam-health", "--out", out2])
    assert os.path.exists(out2)
    assert "binary labels" in capsys.readouterr().out
