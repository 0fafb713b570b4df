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


# ---------------------------------------------------------------------------
# training-path parity (reference: vae.py:44-58, vae_nets.py:14-19,48-62)
# ---------------------------------------------------------------------------


def _fresh_training_pair(seed: int = 7):
    """A fresh torch VAE in TRAIN mode + its weights mirrored into JAX."""
    import torch

    sys.path.insert(0, REFERENCE)
    from vae_nets import VariationalAutoencoder

    from critic_vae_tpu.models.vae import vae_params_from_torch

    torch.manual_seed(seed)
    tvae = VariationalAutoencoder()
    for m in tvae.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.uniform_(-0.2, 0.2)
            m.running_var.uniform_(0.8, 1.2)
    tvae.train()  # the reference never calls .eval() before train (vae.py:33)
    # .copy() is load-bearing: torch .numpy() shares memory with the tensor,
    # and on the CPU backend jnp.asarray may zero-copy alias that memory —
    # without the copy, torch's in-place opt.step() mutates OUR params too.
    params, bn_state = vae_params_from_torch(
        {k: v.numpy().copy() for k, v in tvae.encoder.state_dict().items()},
        {k: v.numpy().copy() for k, v in tvae.decoder.state_dict().items()},
    )
    return tvae, params, bn_state


def _torch_grads_as_pytree(tvae):
    """Torch .grad tensors converted through the same ingestion path as the
    weights, so grad pytrees are directly comparable leaf-for-leaf."""
    from critic_vae_tpu.models.vae import vae_params_from_torch

    def grad_sd(module):
        sd = {k: v.numpy() for k, v in module.state_dict().items()}
        out = dict(sd)  # keeps running stats for the converter's state output
        for k, p in module.named_parameters():
            out[k] = p.grad.detach().numpy()
        return out

    gparams, _ = vae_params_from_torch(grad_sd(tvae.encoder), grad_sd(tvae.decoder))
    return gparams


def test_train_step_parity_single_step(episode):
    """One full optimization step — loss, gradients, post-Adam params, and
    BN running stats — against the actual torch reference with identical
    injected reparametrization noise (vae.py:44-58)."""
    import jax
    import jax.numpy as jnp
    import torch

    import critic_vae_tpu.models.vae as vae_mod
    from critic_vae_tpu.models.critic import critic_apply, load_critic
    from critic_vae_tpu.ops.losses import vae_loss
    from critic_vae_tpu.train.step import TrainState, init_train_state, make_train_step

    sys.path.insert(0, REFERENCE)
    from critic_net import Critic

    frames, _ = episode
    batch = frames[:16].astype(np.float32) / 255.0  # (16, 64, 64, 3)
    # seed 9: a weight draw where the reference's MS-SSIM stays out of its
    # genuine NaN regime (negative SSIM^0.1333 — it diverges there for real,
    # so there is nothing to compare against)
    tvae, params, bn_state = _fresh_training_pair(seed=9)

    tcritic = Critic()
    tcritic.load_state_dict(torch.load(CRITIC_PT, weights_only=True))
    tcritic.eval()  # load_critic does this (vae_utility.py:363-368)
    critic_params = load_critic(CRITIC_PT)

    rng = np.random.default_rng(5)
    eps = rng.standard_normal((16, 32)).astype(np.float32)

    # --- torch reference step (vae.py:44-58 verbatim, eps injected) -------
    images_t = torch.tensor(batch.transpose(0, 3, 1, 2))
    opt = torch.optim.Adam(tvae.parameters(), lr=5e-5)
    eps_t = torch.tensor(eps)
    tvae.reparametrize = lambda mu, logvar: mu + eps_t * torch.exp(0.5 * logvar)
    preds_t = tcritic.evaluate(images_t)
    opt.zero_grad()
    out = tvae(images_t, preds_t)
    losses_t = tvae.vae_loss(out[0], out[1], out[2], out[3])
    assert torch.isfinite(losses_t["total_loss"]), "torch side NaNed; reseed the test"
    losses_t["total_loss"].backward()
    ref_grads = _torch_grads_as_pytree(tvae)
    opt.step()
    ref_params, ref_bn = vae_mod.vae_params_from_torch(
        {k: v.detach().numpy() for k, v in tvae.encoder.state_dict().items()},
        {k: v.detach().numpy() for k, v in tvae.decoder.state_dict().items()},
    )

    # --- our step: the production make_train_step with eps patched --------
    eps_j = jnp.asarray(eps)

    def fixed_reparam(key, mu, logvar):
        return mu + eps_j.astype(mu.dtype) * jnp.exp(0.5 * logvar)

    x = jnp.asarray(batch)
    with mock.patch.object(vae_mod, "reparametrize", fixed_reparam), \
         jax.default_matmul_precision("highest"):
        # gradient comparison (same loss composition as _step_logic)
        def loss_fn(p):
            preds = jax.lax.stop_gradient(critic_apply(critic_params, x))
            recon, mu, logvar, new_bn = vae_mod.vae_apply(
                p, bn_state, jax.random.key(0), x, preds, train=True
            )
            return vae_loss(x, mu, logvar, recon)["total_loss"], new_bn

        (loss_j, new_bn), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)

        state, tx = init_train_state(jax.random.key(0))
        state = TrainState(params, bn_state, tx.init(params), state.rng, state.step)
        step = make_train_step(critic_params, tx, donate=False)
        new_state, metrics = step(state, x)

    # loss parity (verdict round 1: <=1e-4)
    np.testing.assert_allclose(
        float(loss_j), float(losses_t["total_loss"].detach()), atol=1e-4
    )
    np.testing.assert_allclose(
        float(metrics["total_loss"]), float(losses_t["total_loss"].detach()), atol=1e-4
    )
    np.testing.assert_allclose(
        float(metrics["kld"]), float(losses_t["KLD"].detach()), atol=1e-5
    )

    # gradient parity, leaf for leaf
    flat_ours = {jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_leaves_with_path(grads)}
    flat_ref = {jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_leaves_with_path(ref_grads)}
    assert flat_ours.keys() == flat_ref.keys()
    for k in flat_ours:
        np.testing.assert_allclose(
            np.asarray(flat_ours[k]), np.asarray(flat_ref[k]),
            atol=5e-5, rtol=1e-3, err_msg=k,
        )

    # post-Adam params: at step 1 Adam's update is ~lr*sign(g), so a sign
    # flip on a numerically-zero grad costs at most 2*lr = 1e-4
    for (k, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(new_state.params),
        jax.tree_util.tree_leaves_with_path(ref_params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1.5e-4,
            err_msg=jax.tree_util.keystr(k),
        )

    # train-mode BatchNorm running-stat parity (momentum 0.1, unbiased var)
    for (k, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(new_state.bn_state),
        jax.tree_util.tree_leaves_with_path(ref_bn),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4,
            err_msg=jax.tree_util.keystr(k),
        )


def test_train_loss_curve_parity(episode):
    """10 optimization steps with shared per-step noise: the loss curves must
    track the torch reference (reference loop: vae.py:44-58). Uses an
    explicit-eps jitted step composed of the same functions as _step_logic
    (critic -> vae_apply -> vae_loss -> adam), since the production step
    derives eps from its internal RNG which torch cannot replay."""
    import jax
    import jax.numpy as jnp
    import optax
    import torch

    import critic_vae_tpu.models.vae as vae_mod
    from critic_vae_tpu.models.critic import critic_apply, load_critic
    from critic_vae_tpu.ops.losses import vae_loss

    sys.path.insert(0, REFERENCE)
    from critic_net import Critic

    frames, _ = episode
    batch = frames[:16].astype(np.float32) / 255.0
    tvae, params, bn_state = _fresh_training_pair(seed=9)
    tcritic = Critic()
    tcritic.load_state_dict(torch.load(CRITIC_PT, weights_only=True))
    tcritic.eval()
    critic_params = load_critic(CRITIC_PT)

    steps = 10
    rng = np.random.default_rng(5)
    eps_all = rng.standard_normal((steps, 16, 32)).astype(np.float32)

    # --- torch loop --------------------------------------------------------
    images_t = torch.tensor(batch.transpose(0, 3, 1, 2))
    opt = torch.optim.Adam(tvae.parameters(), lr=5e-5)
    cur_eps = {}
    tvae.reparametrize = lambda mu, logvar: mu + cur_eps["t"] * torch.exp(0.5 * logvar)
    losses_ref = []
    preds_t = tcritic.evaluate(images_t)
    for i in range(steps):
        cur_eps["t"] = torch.tensor(eps_all[i])
        opt.zero_grad()
        out = tvae(images_t, preds_t)
        losses = tvae.vae_loss(out[0], out[1], out[2], out[3])
        losses["total_loss"].backward()
        opt.step()
        losses_ref.append(float(losses["total_loss"].detach()))

    # --- our loop ----------------------------------------------------------
    tx = optax.adam(5e-5, b1=0.9, b2=0.999, eps=1e-8)
    opt_state = tx.init(params)
    x = jnp.asarray(batch)

    @jax.jit
    def explicit_step(params, bn, opt_state, eps):
        def loss_fn(p):
            preds = jax.lax.stop_gradient(critic_apply(critic_params, x))
            mu, logvar, new_bn = vae_mod.encode(p, bn, x, train=True)
            z = mu + eps * jnp.exp(0.5 * logvar)
            recon = vae_mod.decode(p, z, preds)
            losses = vae_loss(x, mu, logvar, recon)
            return losses["total_loss"], new_bn

        (loss, new_bn), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_bn, new_opt, loss

    losses_ours = []
    with jax.default_matmul_precision("highest"):
        for i in range(steps):
            params, bn_state, opt_state, loss = explicit_step(
                params, bn_state, opt_state, jnp.asarray(eps_all[i])
            )
            losses_ours.append(float(loss))

    np.testing.assert_allclose(losses_ours, losses_ref, atol=5e-4, rtol=1e-3)


def test_crf_scaffold_matches_reference_wrapper(reference_modules, episode):
    """Our crf_reference_scaffold reproduces the reference crf() wrapper's
    full scaffold — skip-view subsampling, in-place mutation, pass-through of
    unrefined frames (vae_utility.py:22-54) — byte for byte."""
    _vae_nets, vae_utility = reference_modules
    frames, gt = episode
    rng = np.random.default_rng(4)
    noisy = gt ^ (rng.random(gt.shape) < 0.1)
    mask = noisy[:, None].astype(np.float64)

    # the reference needs gt with a trailing channel axis for its Y & M
    # broadcast (same layout its caller uses, vae_utility.py:185)
    ref_out = vae_utility.crf(frames, mask.copy(), gt[..., np.newaxis], skip=2)

    from critic_vae_tpu.crf import crf_reference_scaffold

    ours, results = crf_reference_scaffold(frames, mask.copy(), gt, skip=2)
    np.testing.assert_array_equal(np.asarray(ours), np.asarray(ref_out))
    assert len(results) == 1  # the reference grid is a single combination
    assert 0.0 <= results[0][0] <= 1.0


def test_export_roundtrip_into_reference_modules(reference_modules, tmp_path, episode):
    """Weights exported via save_torch_pt + the inverse converters load into
    the reference's ACTUAL torch modules (strict state_dict load) and
    reproduce our deterministic forward — the full interop inverse of
    checkpoint ingestion (reference load sites: vae_utility.py:354-366)."""
    import jax
    import torch

    _vae_nets, _vae_utility = reference_modules
    sys.path.insert(0, REFERENCE)
    from critic_net import Critic
    from vae_nets import VariationalAutoencoder

    from critic_vae_tpu.io.legacy_pt import save_torch_pt
    from critic_vae_tpu.models.critic import (
        critic_apply,
        critic_state_dict_to_torch,
        init_critic_params,
    )
    from critic_vae_tpu.models.vae import (
        evaluate,
        init_vae_params,
        vae_state_dicts_to_torch,
    )

    frames, _gt = episode
    x = frames[:8].astype(np.float32) / 255.0

    # --- VAE: ours → .pt → reference modules → eval-path forward ----------
    params, bn = init_vae_params(jax.random.key(42))
    # make BN stats nontrivial so the export path is actually exercised
    bn = {k: {"mean": v["mean"] + 0.05, "var": v["var"] * 1.1} for k, v in bn.items()}
    enc_sd, dec_sd = vae_state_dicts_to_torch(params, bn)
    enc_pt, dec_pt = str(tmp_path / "enc.pt"), str(tmp_path / "dec.pt")
    save_torch_pt(enc_pt, enc_sd)
    save_torch_pt(dec_pt, dec_sd)

    tvae = VariationalAutoencoder()
    tvae.encoder.load_state_dict(torch.load(enc_pt, weights_only=True))
    tvae.decoder.load_state_dict(torch.load(dec_pt, weights_only=True))
    tvae.eval()

    values = np.linspace(0.1, 0.9, 8).astype(np.float32)
    with jax.default_matmul_precision("highest"):
        ours = np.asarray(evaluate(params, bn, jax.numpy.asarray(x), jax.numpy.asarray(values)))
    with torch.no_grad():
        for i in range(8):  # reference evaluate is batch-1 (vae_nets.py:42-46)
            t = torch.tensor(x[i].transpose(2, 0, 1)[None])
            ref = tvae.evaluate(t, torch.tensor([values[i]]))
            np.testing.assert_allclose(
                ours[i], ref[0].numpy().transpose(1, 2, 0), atol=2e-5
            )

    # --- critic: ours → .pt → reference Critic → evaluate ------------------
    cparams = init_critic_params(jax.random.key(7))
    crit_pt = str(tmp_path / "critic.pt")
    save_torch_pt(crit_pt, critic_state_dict_to_torch(cparams))
    tcritic = Critic()
    tcritic.load_state_dict(torch.load(crit_pt, weights_only=True))
    tcritic.eval()
    with jax.default_matmul_precision("highest"):
        ours_p = np.asarray(critic_apply(cparams, jax.numpy.asarray(x)))
    ref_p = tcritic.evaluate(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(ours_p, ref_p, atol=2e-5)
