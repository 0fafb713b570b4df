"""End-to-end parity: our video pipeline vs the ACTUAL torch reference.

Runs the reference's own ``eval_textured_frames`` (vae_utility.py:162-212)
on a synthetic episode with identical weights and compares the headline
outputs — critic predictions, diff masks, threshold masks, thr/crf IoU —
against this framework's pipeline.

The reference hard-imports ``minerl`` and ``denseCRF`` at module load
(vae_utility.py:3,12); both are stubbed — denseCRF with THIS framework's
C++ CRF, so the comparison exercises our CRF through the reference's exact
call pattern (including its (1, H, W, 3) img slices, vae_utility.py:36-39).
"""

import os
import sys
import types
from unittest import mock

import numpy as np
import pytest

from tests.conftest import CRITIC_PT, REFERENCE, requires_reference, requires_torch

pytestmark = [requires_reference, requires_torch]


@pytest.fixture(scope="module")
def reference_modules():
    """Import the reference with minerl/denseCRF stubbed and fonts faked."""
    import critic_vae_tpu.crf as our_crf
    from PIL import ImageFont

    minerl_stub = types.ModuleType("minerl")
    dense_stub = types.ModuleType("denseCRF")
    dense_stub.densecrf = lambda img, prob, param: our_crf.densecrf(img, prob, param)

    sys.modules.setdefault("minerl", minerl_stub)
    sys.modules["denseCRF"] = dense_stub
    sys.path.insert(0, REFERENCE)
    real_truetype = ImageFont.truetype

    def safe_truetype(path, size=10, **kw):
        try:
            return real_truetype(path, size, **kw)
        except OSError:
            return ImageFont.load_default()

    with mock.patch.object(ImageFont, "truetype", safe_truetype):
        import vae_nets
        import vae_utility

    yield vae_nets, vae_utility


@pytest.fixture(scope="module")
def shared_weights():
    """One random torch VAE + the bundled critic, mirrored into JAX."""
    import torch

    sys.path.insert(0, REFERENCE)
    from critic_net import Critic
    from vae_nets import VariationalAutoencoder

    from critic_vae_tpu.models.critic import load_critic
    from critic_vae_tpu.models.vae import vae_params_from_torch

    torch.manual_seed(7)
    tvae = VariationalAutoencoder()
    for m in tvae.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.uniform_(-0.2, 0.2)
            m.running_var.uniform_(0.8, 1.2)
    tvae.eval()

    tcritic = Critic()
    tcritic.load_state_dict(torch.load(CRITIC_PT, weights_only=True))
    tcritic.eval()

    params, bn_state = vae_params_from_torch(
        {k: v.numpy() for k, v in tvae.encoder.state_dict().items()},
        {k: v.numpy() for k, v in tvae.decoder.state_dict().items()},
    )
    critic_params = load_critic(CRITIC_PT)
    return tvae, tcritic, params, bn_state, critic_params


@pytest.fixture(scope="module")
def episode():
    from critic_vae_tpu.data.synthetic import generate_frames

    frames, gt = generate_frames(24, seed=11)
    return frames, gt


def _run_reference(vae_utility, tvae, tcritic, frames, gt, t=50):
    """The reference's eval_textured_frames, with its bin-diagnostics side
    output stubbed: statistics.stdev crashes on singleton bins there (the
    known reference bug — SURVEY §2.1 #17 / our write_bin_info docstring),
    and it doesn't feed the returned IoUs."""
    with mock.patch.object(vae_utility, "save_bin_info", lambda *a, **k: None):
        return vae_utility.eval_textured_frames(frames, tvae, tcritic, gt, t=t)


def test_video_pipeline_parity(reference_modules, shared_weights, episode):
    import jax

    from critic_vae_tpu.pipelines.video import eval_episode

    _vae_nets, vae_utility = reference_modules
    tvae, tcritic, params, bn_state, critic_params = shared_weights
    frames, gt = episode

    _strips, ref_thr_iou, ref_crf_iou = _run_reference(
        vae_utility, tvae, tcritic, frames, gt
    )

    with jax.default_matmul_precision("highest"):
        ours = eval_episode(
            params, bn_state, critic_params, frames, gt,
            threshold=50, run_crf=True, batch_size=24,
        )

    # headline numbers (reference rounds to 3 decimals, vae_utility.py:66)
    assert abs(ours.thr_iou - ref_thr_iou) <= 0.005, (ours.thr_iou, ref_thr_iou)
    assert abs(ours.crf_iou - ref_crf_iou) <= 0.02, (ours.crf_iou, ref_crf_iou)


def test_diff_mask_parity(reference_modules, shared_weights, episode):
    """Per-frame diff maps + threshold masks vs the reference's loop."""
    import jax
    import torch

    _vae_nets, vae_utility = reference_modules
    tvae, tcritic, params, bn_state, critic_params = shared_weights
    frames, gt = episode

    # reference per-frame path (vae_utility.py:171-183)
    diffs, maxv, preds = [], [], []
    with torch.no_grad():
        for image in frames:
            frame_t = vae_utility.preprocess_observation(image)
            pred = tcritic.evaluate(frame_t)
            _ro, _rz, diff, mx = vae_utility.get_diff_image(tvae, frame_t, pred[0])
            diffs.append(diff)
            maxv.append(mx)
            preds.append(float(pred[0]))
    ref_diffs, ref_masks = vae_utility.get_diff_and_thr_masks(diffs, maxv, thr=50)

    from critic_vae_tpu.ops.mask import normalize_diffs, threshold_masks
    from critic_vae_tpu.pipelines.video import episode_device_stage

    with jax.default_matmul_precision("highest"):
        dev = episode_device_stage(
            params, bn_state, critic_params,
            frames.astype(np.float32) / 255.0, batch_size=24, with_recons=False,
        )
        import jax.numpy as jnp

        diff_u8, _ = normalize_diffs(jnp.asarray(dev["diff"]), jnp.asarray(dev["max_value"]))
        masks = np.asarray(threshold_masks(diff_u8, jnp.asarray([50]))[0])
        diff_u8 = np.asarray(diff_u8)

    np.testing.assert_allclose(dev["preds"], np.asarray(preds), atol=1e-4)
    # uint8 quantization can flip borderline pixels under f32 reassociation;
    # demand near-exact agreement
    assert (np.abs(diff_u8.astype(int) - ref_diffs.astype(int)) <= 1).mean() > 0.999
    assert (masks == ref_masks).mean() > 0.998


def test_crf_called_like_reference(reference_modules, episode):
    """The reference's crf() wrapper (vae_utility.py:22-54) driven with our
    densecrf must equal our batched refine_masks."""
    _vae_nets, vae_utility = reference_modules
    frames, gt = episode
    rng = np.random.default_rng(0)
    thr_masks = gt ^ (rng.random(gt.shape) < 0.05)

    crf_imgs = frames[:, np.newaxis, ...]
    crf_mask = thr_masks[:, np.newaxis, ...].astype(np.float32)
    crf_gt = gt[..., np.newaxis]
    ref = vae_utility.crf(crf_imgs, crf_mask, crf_gt).squeeze()

    from critic_vae_tpu.crf import refine_masks

    ours = refine_masks(frames, thr_masks)
    assert (ref == ours).mean() > 0.999


def test_image_eval_parity(reference_modules, shared_weights, source_images):
    """Our batched evaluate_images vs the reference's per-image eval loop
    (vae.py:80-106: get_diff_image per image, then the two-pass mean-max
    normalization over the whole image set)."""
    import statistics

    import jax
    import torch

    _vae_nets, vae_utility = reference_modules
    tvae, tcritic, params, bn_state, critic_params = shared_weights
    images = source_images[:16]

    imgs, maxima, preds = [], [], []
    with torch.no_grad():
        for im in images:
            t = torch.from_numpy(im.transpose(2, 0, 1)[None])
            pred = tcritic.evaluate(t)
            _ro, _rz, diff, mx = vae_utility.get_diff_image(tvae, t, pred[0])
            imgs.append(diff)
            maxima.append(mx)
            preds.append(float(pred[0]))
    mean_max = statistics.mean(maxima)
    factor = 1 / mean_max if mean_max != 0 else 0
    ref_u8 = np.stack(
        [(vae_utility.prepare_diff(d, factor, mean_max) * 255).astype(np.uint8)
         for d in imgs]
    )

    from critic_vae_tpu.pipelines.evaluate import evaluate_images

    with jax.default_matmul_precision("highest"):
        ours = evaluate_images(params, bn_state, critic_params, images)
    np.testing.assert_allclose(ours["preds"], preds, atol=1e-4)
    agree = (np.abs(ours["diff_u8"].astype(int) - ref_u8.astype(int)) <= 1).mean()
    assert agree > 0.999, agree


def test_critic_collect_parity(shared_weights, episode):
    """collect=True feature maps match torch's post-pool activations
    (critic_net.py:44-57)."""
    import jax
    import torch

    tvae, tcritic, params, bn_state, critic_params = shared_weights
    frames, _ = episode
    x = frames[:4].astype(np.float32) / 255.0
    with torch.no_grad():
        t_pred, t_embeds = tcritic(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), collect=True
        )
    from critic_vae_tpu.models.critic import critic_apply

    import jax.numpy as jnp

    with jax.default_matmul_precision("highest"):
        pred, embeds = critic_apply(critic_params, jnp.asarray(x), collect=True)
    np.testing.assert_allclose(np.asarray(pred), t_pred.numpy(), atol=1e-5)
    assert len(embeds) == len(t_embeds)
    for ours, theirs in zip(embeds, t_embeds):
        np.testing.assert_allclose(
            np.asarray(ours).transpose(0, 3, 1, 2), theirs.numpy(), atol=1e-4
        )


def test_bin_info_format_parity(reference_modules, tmp_path):
    """Our bin_info file matches the reference's save_bin_info_file line for
    line, apart from the documented divisor fix (actual frame count instead
    of the hardcoded 1200, vae_utility.py:124)."""
    _vae_nets, vae_utility = reference_modules

    bin_ious = {0.2: [0.5, 0.7, 0.6], 0.8: [0.9, 0.8]}
    bin_frames = {0.2: 3, 0.8: 2}
    bin_gts = {0.2: 120, 0.8: 380}

    import contextlib

    cwd = os.getcwd()
    os.chdir(tmp_path)  # reference writes bin_info_vae1.txt into cwd
    try:
        vae_utility.save_bin_info_file(bin_ious, bin_frames, bin_gts)
    finally:
        os.chdir(cwd)
    ref_text = open(tmp_path / "bin_info_vae1.txt").read()

    from critic_vae_tpu.pipelines.video import write_bin_info

    ours_path = tmp_path / "ours.txt"
    write_bin_info(
        {"ious": bin_ious, "frames": bin_frames, "gts": bin_gts},
        str(ours_path), total_frames=1200,  # same divisor → identical text
    )
    assert open(ours_path).read() == ref_text
