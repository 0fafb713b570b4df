"""Critic-gradient saliency mask source (ops/saliency.py) — the
beyond-reference mask signal (measured ~2.4× the recon-diff IoU,
docs/artifacts/saliency.json)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from critic_vae_tpu.models.critic import critic_apply, init_critic_params
from critic_vae_tpu.models.vae import init_vae_params
from critic_vae_tpu.ops.saliency import _sep_blur, critic_saliency, gaussian_taps


@pytest.fixture(scope="module")
def critic():
    return init_critic_params(jax.random.key(7))


@pytest.fixture(scope="module")
def frames():
    rng = np.random.default_rng(0)
    return rng.random((4, 64, 64, 3), np.float32)


def test_gaussian_taps_normalized_and_symmetric():
    for sigma in (0.5, 1.0, 1.5, 3.0):
        t = gaussian_taps(sigma)
        np.testing.assert_allclose(t.sum(), 1.0, rtol=1e-6)
        np.testing.assert_allclose(t, t[::-1])
        assert t.argmax() == len(t) // 2


def test_sep_blur_matches_scipy_nearest():
    scipy = pytest.importorskip("scipy")
    from scipy import ndimage

    rng = np.random.default_rng(1)
    x = rng.random((2, 16, 16), np.float32)
    ours = np.asarray(_sep_blur(jnp.asarray(x), jnp.asarray(gaussian_taps(1.5))))
    ref = ndimage.gaussian_filter(x, (0, 1.5, 1.5), mode="nearest")
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_preds_match_critic_apply(critic, frames):
    preds, sal = critic_saliency(critic, jnp.asarray(frames))
    direct = critic_apply(critic, jnp.asarray(frames))[:, 0]
    np.testing.assert_allclose(np.asarray(preds), np.asarray(direct), atol=1e-6)
    assert sal.shape == (4, 64, 64) and sal.dtype == jnp.float32
    assert np.all(np.asarray(sal) >= 0) and np.all(np.isfinite(np.asarray(sal)))


def test_batched_vjp_equals_per_image_grads(critic, frames):
    """The ones-vector pullback must yield each image's OWN gradient
    (predictions are independent across the batch)."""
    _, sal = critic_saliency(critic, jnp.asarray(frames), smooth_sigma=0)

    def one(img):
        g = jax.grad(lambda i: critic_apply(critic, i[None])[0, 0])(img)
        return jnp.abs(g).sum(-1)

    per_image = np.asarray(jax.vmap(one)(jnp.asarray(frames)))
    np.testing.assert_allclose(np.asarray(sal), per_image, atol=1e-6)


def test_smoothing_reduces_roughness(critic, frames):
    _, raw = critic_saliency(critic, jnp.asarray(frames), smooth_sigma=0)
    _, smooth = critic_saliency(critic, jnp.asarray(frames), smooth_sigma=1.5)
    tv = lambda a: np.abs(np.diff(np.asarray(a), axis=-1)).sum()
    assert tv(smooth) < tv(raw)


def test_logit_gradients_differ_but_preds_stay_probabilities(critic, frames):
    """logits=True changes the saliency signal (no σ' damping) but the
    returned preds must still be probabilities (downstream contract)."""
    preds_p, sal_p = critic_saliency(critic, jnp.asarray(frames))
    preds_l, sal_l = critic_saliency(critic, jnp.asarray(frames), logits=True)
    np.testing.assert_allclose(np.asarray(preds_l), np.asarray(preds_p), atol=1e-6)
    assert not np.allclose(np.asarray(sal_l), np.asarray(sal_p))


def test_smoothgrad_deterministic_given_key(critic, frames):
    x = jnp.asarray(frames)
    k = jax.random.key(3)
    _, a = critic_saliency(critic, x, samples=4, noise=0.05, key=k)
    _, b = critic_saliency(critic, x, samples=4, noise=0.05, key=k)
    _, c = critic_saliency(critic, x, samples=4, noise=0.05, key=jax.random.key(4))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.array_equal(np.asarray(a), np.asarray(c))
    # clean-input preds regardless of the noise
    preds, _ = critic_saliency(critic, x, samples=4, noise=0.05, key=k)
    direct = critic_apply(critic, x)[:, 0]
    np.testing.assert_allclose(np.asarray(preds), np.asarray(direct), atol=1e-6)


def test_smoothgrad_requires_key(critic, frames):
    with pytest.raises(ValueError, match="key"):
        critic_saliency(critic, jnp.asarray(frames), samples=8, noise=0.08)


def test_smoothgrad_zero_noise_one_sample_equals_deterministic(critic, frames):
    x = jnp.asarray(frames)
    _, det = critic_saliency(critic, x)
    _, sg = critic_saliency(
        critic, x, samples=1, noise=0.0, key=jax.random.key(0)
    )
    np.testing.assert_array_equal(np.asarray(det), np.asarray(sg))


def test_smoothgrad_zero_noise_many_samples_short_circuits(critic, frames):
    """noise=0 with samples>1 is the deterministic path (identical copies
    would average to the single VJP) — exact output, no key needed."""
    x = jnp.asarray(frames)
    _, det = critic_saliency(critic, x)
    _, sg = critic_saliency(critic, x, samples=8, noise=0.0)
    np.testing.assert_array_equal(np.asarray(det), np.asarray(sg))


def test_layercam_matches_independent_head_tail_split(critic, frames):
    """The zero-offset VJP trick must equal a direct head/tail split:
    run the critic to block k, differentiate the tail w.r.t. the
    activation, ReLU(g*a).sum(-1), bilinear-upsample."""
    from critic_vae_tpu.models.critic import _conv_same, _maxpool2

    x = jnp.asarray(frames)

    def head(h, k):
        for i in range(k + 1):
            h = _maxpool2(jax.nn.relu(_conv_same(
                h, critic[f"conv{i}_w"], critic[f"conv{i}_b"])))
        return h

    def tail(a, k):
        h = a
        for i in range(k + 1, 4):
            h = _maxpool2(jax.nn.relu(_conv_same(
                h, critic[f"conv{i}_w"], critic[f"conv{i}_b"])))
        h = jax.lax.conv_general_dilated(
            h, critic["conv4_w"], (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + critic["conv4_b"]
        z = jax.nn.relu(h).reshape(h.shape[0], -1)
        z = jax.nn.relu(z @ critic["fc0_w"] + critic["fc0_b"])
        return (z @ critic["fc1_w"] + critic["fc1_b"])[:, 0]

    for k in (0, 1, 3):
        a = head(x, k)
        s, vjp = jax.vjp(lambda aa: tail(aa, k), a)
        (g,) = vjp(jnp.ones_like(s))
        raw = jax.nn.relu(g * a).sum(-1)
        for kernel in ("bilinear", "lanczos3"):
            want = jnp.maximum(jax.image.resize(
                raw, (len(frames), 64, 64), kernel), 0)
            _, got = critic_saliency(critic, x, method="layercam",
                                     cam_block=k, cam_upsample=kernel)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), atol=1e-6,
                err_msg=f"block {k} {kernel}")


def test_layercam_preds_are_critic_probabilities(critic, frames):
    x = jnp.asarray(frames)
    direct = critic_apply(critic, x)[:, 0]
    for kw in ({}, {"samples": 2, "noise": 0.05, "key": jax.random.key(1)}):
        preds, sal = critic_saliency(critic, x, method="layercam", **kw)
        np.testing.assert_allclose(
            np.asarray(preds), np.asarray(direct), atol=1e-6)
        assert sal.shape == (4, 64, 64) and sal.dtype == jnp.float32
        s = np.asarray(sal)
        assert np.all(s >= 0) and np.all(np.isfinite(s))


def test_layercam_default_sigma_is_zero(critic, frames):
    """The per-method smoothing default: gradient keeps 1.5, layercam 0
    (measured: blurring CAM maps only costs IoU)."""
    x = jnp.asarray(frames)
    _, default = critic_saliency(critic, x, method="layercam")
    _, sig0 = critic_saliency(critic, x, method="layercam", smooth_sigma=0)
    _, sig15 = critic_saliency(critic, x, method="layercam", smooth_sigma=1.5)
    np.testing.assert_array_equal(np.asarray(default), np.asarray(sig0))
    assert not np.allclose(np.asarray(default), np.asarray(sig15))


def test_layercam_handles_nonf32_critic_params(critic, frames):
    """The CAM path must inherit critic_apply's param→input dtype casts
    (regression: a hand-copied forward without the casts crashed on any
    non-f32 checkpoint while the gradient method worked)."""
    x = jnp.asarray(frames)
    bf16 = {k: v.astype(jnp.bfloat16) for k, v in critic.items()}
    ref_preds, ref_sal = critic_saliency(critic, x, method="layercam")
    preds, sal = critic_saliency(bf16, x, method="layercam")
    np.testing.assert_allclose(np.asarray(preds), np.asarray(ref_preds),
                               atol=0.02)
    assert sal.shape == ref_sal.shape


def test_layercam_validation(critic, frames):
    x = jnp.asarray(frames)
    with pytest.raises(ValueError, match="cam_block"):
        critic_saliency(critic, x, method="layercam", cam_block=4)
    with pytest.raises(ValueError, match="method"):
        critic_saliency(critic, x, method="gradcam")
    with pytest.raises(ValueError, match="cam_upsample"):
        critic_saliency(critic, x, method="layercam", cam_upsample="cubic")


def test_episode_forward_layercam(critic, frames):
    from critic_vae_tpu.ops.mask import episode_forward

    vae_params, bn = init_vae_params(jax.random.key(0))
    out = episode_forward(
        vae_params, bn, critic, jnp.asarray(frames), mask_source="saliency",
        saliency_method="layercam", saliency_cam_block=1, with_recons=False,
    )
    _, sal = critic_saliency(critic, jnp.asarray(frames), method="layercam")
    np.testing.assert_allclose(np.asarray(out["diff"]), np.asarray(sal),
                               atol=1e-6)


def test_tta_flip_is_min_of_both_views(critic, frames):
    """tta_flip must equal the element-wise min of the clean map and the
    un-flipped map of the flipped frames (raw pre-normalization combine —
    the measured winner, docs/artifacts/cam_tta.json), with preds from the
    clean view."""
    x = jnp.asarray(frames)
    for kw in (dict(method="layercam", cam_block=1),
               dict(method="gradient", smooth_sigma=1.5)):
        preds, sal = critic_saliency(critic, x, tta_flip=True, **kw)
        p0, s0 = critic_saliency(critic, x, **kw)
        _, s1 = critic_saliency(critic, x[:, :, ::-1], **kw)
        np.testing.assert_allclose(
            np.asarray(sal),
            np.minimum(np.asarray(s0), np.asarray(s1)[:, :, ::-1]),
            atol=1e-6)
        np.testing.assert_allclose(np.asarray(preds), np.asarray(p0),
                                   atol=1e-6)


def test_tta_shift_is_min_of_product_views_with_border_excluded(critic, frames):
    """tta_flip+tta_shift must min-combine the full {id, mirror} ×
    {0, ±D px} product of views (6 maps — measured better than
    flip-then-shift-of-clean, docs/artifacts/cam_tta_shift_crf.json),
    each transformed back to original coordinates with its un-shiftable
    border columns excluded from the min."""
    x = jnp.asarray(frames)
    D = 2
    preds, sal = critic_saliency(critic, x, method="layercam",
                                 tta_flip=True, tta_shift=D)
    p0, s0 = critic_saliency(critic, x, method="layercam")
    expect = np.asarray(s0).astype(np.float64)
    W = x.shape[2]
    for flip in (False, True):
        for dx in (0, D, -D):
            if not flip and dx == 0:
                continue
            xv = np.asarray(frames)[:, :, ::-1] if flip else np.asarray(frames)
            _, m = critic_saliency(
                critic, jnp.asarray(np.roll(xv, dx, axis=2)),
                method="layercam")
            m = np.roll(np.asarray(m), -dx, axis=2).astype(np.float64)
            if flip:
                m = m[:, :, ::-1]
                dx = -dx
            # a +dx roll wraps the frame's right-edge columns into the
            # view's entering left edge; after roll-back those contaminated
            # values sit at cols >= W-dx (the round-4 code excluded the
            # clean opposite edge — ADVICE r4 medium)
            if dx > 0:
                m[:, :, W - dx:] = np.inf
            elif dx < 0:
                m[:, :, :-dx] = np.inf
            expect = np.minimum(expect, m)
    np.testing.assert_allclose(np.asarray(sal), expect.astype(np.float32),
                               atol=1e-6)
    assert np.all(np.isfinite(np.asarray(sal)))
    np.testing.assert_allclose(np.asarray(preds), np.asarray(p0), atol=1e-6)
    with pytest.raises(ValueError, match="tta_shift"):
        critic_saliency(critic, x, tta_shift=-1)


def test_tta_flip_through_pipeline(critic, frames):
    """--saliency-tta-flip plumbing: episode_forward and the video stage
    produce the TTA map."""
    from critic_vae_tpu.ops.mask import episode_forward

    vae_params, bn = init_vae_params(jax.random.key(0))
    out = episode_forward(
        vae_params, bn, critic, jnp.asarray(frames), mask_source="saliency",
        saliency_method="layercam", saliency_tta_flip=True,
        with_recons=False,
    )
    _, sal = critic_saliency(critic, jnp.asarray(frames), method="layercam",
                             tta_flip=True)
    np.testing.assert_allclose(np.asarray(out["diff"]), np.asarray(sal),
                               atol=1e-6)


def test_invalid_sample_and_noise_counts_raise(critic, frames):
    """samples=0 must fail loudly, not average over an empty axis into
    all-NaN maps that flow silently through normalization."""
    x = jnp.asarray(frames)
    with pytest.raises(ValueError, match="samples"):
        critic_saliency(critic, x, samples=0, noise=0.08,
                        key=jax.random.key(0))
    with pytest.raises(ValueError, match="noise"):
        critic_saliency(critic, x, noise=-0.1, key=jax.random.key(0))


def test_episode_forward_saliency_source(critic, frames):
    from critic_vae_tpu.ops.mask import episode_forward

    vae_params, bn = init_vae_params(jax.random.key(0))
    out = episode_forward(
        vae_params, bn, critic, jnp.asarray(frames), mask_source="saliency"
    )
    _, sal = critic_saliency(critic, jnp.asarray(frames))
    np.testing.assert_allclose(np.asarray(out["diff"]), np.asarray(sal), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out["max_value"]), np.asarray(sal).max(axis=(1, 2)), atol=1e-6
    )
    # recons still produced for panel composition
    assert out["recon_one"].shape == frames.shape
    with pytest.raises(ValueError):
        episode_forward(
            vae_params, bn, critic, jnp.asarray(frames), mask_source="nope"
        )


def test_episode_forward_smoothgrad_options(critic, frames):
    from critic_vae_tpu.ops.mask import episode_forward

    vae_params, bn = init_vae_params(jax.random.key(0))
    out = episode_forward(
        vae_params, bn, critic, jnp.asarray(frames), mask_source="saliency",
        with_recons=False, saliency_logits=True, saliency_samples=4,
        saliency_noise=0.08, saliency_seed=np.uint32(5),
    )
    _, expect = critic_saliency(
        critic, jnp.asarray(frames), logits=True, samples=4, noise=0.08,
        key=jax.random.key(np.uint32(5)),
    )
    np.testing.assert_allclose(np.asarray(out["diff"]), np.asarray(expect),
                               atol=1e-6)
    # smoothing sigma threads through (0 = raw gradients)
    raw = episode_forward(
        vae_params, bn, critic, jnp.asarray(frames), mask_source="saliency",
        with_recons=False, saliency_sigma=0.0,
    )
    _, expect_raw = critic_saliency(critic, jnp.asarray(frames), smooth_sigma=0)
    np.testing.assert_allclose(np.asarray(raw["diff"]), np.asarray(expect_raw),
                               atol=1e-6)
    # sampling without a seed is a loud error
    with pytest.raises(ValueError, match="saliency_seed"):
        episode_forward(
            vae_params, bn, critic, jnp.asarray(frames),
            mask_source="saliency", with_recons=False,
            saliency_samples=4, saliency_noise=0.08,
        )


def test_eval_episode_smoothgrad_options_end_to_end(critic):
    from critic_vae_tpu.data.synthetic import generate_frames
    from critic_vae_tpu.pipelines.video import eval_episode

    frames, gt = generate_frames(12, seed=11)
    vae_params, bn = init_vae_params(jax.random.key(0))
    opts = {"logits": True, "samples": 4, "noise": 0.08, "seed": 7}
    res = eval_episode(
        vae_params, bn, critic, frames, gt, batch_size=8, run_crf=False,
        mask_source="saliency", saliency_opts=opts,
    )
    res2 = eval_episode(
        vae_params, bn, critic, frames, gt, batch_size=8, run_crf=False,
        mask_source="saliency", saliency_opts=opts,
    )
    det = eval_episode(
        vae_params, bn, critic, frames, gt, batch_size=8, run_crf=False,
        mask_source="saliency",
    )
    # deterministic given the seed, different signal from the single-VJP path
    np.testing.assert_array_equal(res.diff_u8, res2.diff_u8)
    assert not np.array_equal(res.diff_u8, det.diff_u8)
    with pytest.raises(ValueError, match="saliency_opts"):
        eval_episode(
            vae_params, bn, critic, frames, gt, batch_size=8, run_crf=False,
            mask_source="saliency", saliency_opts={"nois": 0.1},
        )


def test_eval_episode_saliency_end_to_end(critic):
    from critic_vae_tpu.data.synthetic import generate_frames
    from critic_vae_tpu.pipelines.video import eval_episode

    frames, gt = generate_frames(12, seed=11)
    vae_params, bn = init_vae_params(jax.random.key(0))
    res = eval_episode(
        vae_params, bn, critic, frames, gt, batch_size=8,
        run_crf=True, crf_backend="device", mask_source="saliency",
    )
    assert res.thr_masks.shape == gt.shape
    assert res.crf_masks.shape == gt.shape
    assert res.diff_u8.dtype == np.uint8
    assert 0.0 <= res.thr_iou <= 1.0
    # the diff_u8 maps are normalized saliency, not recon difference
    base = eval_episode(
        vae_params, bn, critic, frames, gt, batch_size=8, run_crf=False,
    )
    assert not np.array_equal(res.diff_u8, base.diff_u8)


def test_threshold_sweep_saliency(critic):
    from critic_vae_tpu.data.synthetic import generate_frames
    from critic_vae_tpu.pipelines.video import threshold_sweep

    frames, gt = generate_frames(12, seed=11)
    vae_params, bn = init_vae_params(jax.random.key(0))
    sweep = threshold_sweep(
        vae_params, bn, critic, frames, gt, thresholds=[30, 60],
        run_crf=False, batch_size=8, mask_source="saliency",
    )
    assert [r["threshold"] for r in sweep] == [30, 60]
    for r in sweep:
        assert 0.0 <= r["thr_iou"] <= 1.0


def test_sharded_smoothgrad_stage_equals_single(critic):
    """Mesh-sharded saliency device stage ≡ unsharded — including the
    SmoothGrad in-jit RNG: the noise key is built from the same traced
    seed, and threefry is partitionable, so per-frame noise must not
    depend on the shard layout."""
    from critic_vae_tpu.parallel.mesh import make_mesh
    from critic_vae_tpu.pipelines.video import episode_device_stage

    assert jax.device_count() >= 8
    rng = np.random.default_rng(3)
    frames = rng.random((24, 64, 64, 3)).astype(np.float32)
    vae_params, bn = init_vae_params(jax.random.key(0))
    opts = {"logits": True, "samples": 4, "noise": 0.08, "seed": 5,
            "sigma": 1.0}
    kw = dict(batch_size=24, with_recons=False, mask_source="saliency",
              saliency_opts=opts)
    single = episode_device_stage(vae_params, bn, critic, frames, **kw)
    sharded = episode_device_stage(
        vae_params, bn, critic, frames, mesh=make_mesh(8), **kw
    )
    for k in ("preds", "diff", "max_value"):
        np.testing.assert_allclose(
            single[k], sharded[k], atol=1e-5, err_msg=k
        )


def test_sharded_layercam_stage_equals_single(critic):
    """Mesh-sharded LayerCAM ≡ unsharded: the tap VJP and bilinear
    upsample are per-frame, so batch sharding must be transparent."""
    from critic_vae_tpu.parallel.mesh import make_mesh
    from critic_vae_tpu.pipelines.video import episode_device_stage

    assert jax.device_count() >= 8
    rng = np.random.default_rng(4)
    frames = rng.random((24, 64, 64, 3)).astype(np.float32)
    vae_params, bn = init_vae_params(jax.random.key(0))
    kw = dict(batch_size=24, with_recons=False, mask_source="saliency",
              saliency_opts={"method": "layercam", "cam_block": 1})
    single = episode_device_stage(vae_params, bn, critic, frames, **kw)
    sharded = episode_device_stage(
        vae_params, bn, critic, frames, mesh=make_mesh(8), **kw
    )
    for k in ("preds", "diff", "max_value"):
        np.testing.assert_allclose(
            single[k], sharded[k], atol=1e-5, err_msg=k
        )
