"""Phase-packed conv+maxpool fusion exactness (ops/poolconv.py).

The fused stride-2 formulation must reproduce the reference conv→(BN)→pool
graphs exactly (reference: vae_nets.py:68-88 encoder blocks,
critic_net.py:15-29 critic blocks) — it computes the SAME candidate set and
maxes over it, so equality holds for any BN affine, negative scales
included.
"""

import jax
import jax.numpy as jnp
import numpy as np

from critic_vae_tpu.models import vae as vae_mod
from critic_vae_tpu.models.critic import critic_apply, init_critic_params
from critic_vae_tpu.ops.poolconv import conv_pool2_max, conv_pool2_phases


def _maxpool2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


def _conv_same(x, w, b):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + b


def test_conv_pool_fused_matches_reference_graph():
    rng = np.random.default_rng(0)
    for k, cin, cout, hw in [(5, 3, 32, 64), (5, 32, 64, 32), (3, 3, 8, 64), (3, 8, 16, 16)]:
        x = jnp.asarray(rng.normal(size=(2, hw, hw, cin)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(k, k, cin, cout)).astype(np.float32) * 0.1)
        b = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))
        ref = _maxpool2(_conv_same(x, w, b))
        fused = conv_pool2_max(x, w, b)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=2e-5)


def test_phase_tensor_is_pool_candidate_set():
    """Every phase slice must equal the strided full-res conv output."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 4)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(5, 5, 4, 8)).astype(np.float32))
    full = np.asarray(_conv_same(x, w, jnp.zeros((8,))))
    phases = np.asarray(conv_pool2_phases(x, w))
    for a in (0, 1):
        for bb in (0, 1):
            np.testing.assert_allclose(
                phases[:, :, :, 2 * a + bb],
                full[:, a::2, bb::2], atol=2e-5,
            )


def test_encode_fused_pool_matches_baseline_negative_bn_scales():
    """encode(fused_pool=True) ≡ encode() even with sign-flipped BN scales
    (the per-phase-pre-max BN application needs no monotonicity)."""
    params, state = vae_mod.init_vae_params(jax.random.key(0))
    # poison BN: negative scales, shifted means — any affine must commute
    for i in range(4):
        bn = params["encoder"][f"bn{i}"]
        c = bn["scale"].shape[0]
        signs = jnp.asarray(np.where(np.arange(c) % 2, -1.5, 2.0), jnp.float32)
        params["encoder"][f"bn{i}"] = {"scale": signs, "bias": bn["bias"] + 0.3}
        state[f"bn{i}"] = {
            "mean": jnp.linspace(-0.2, 0.2, c),
            "var": jnp.linspace(0.5, 1.5, c),
        }
    x = jnp.asarray(
        np.random.default_rng(2).random((3, 64, 64, 3)).astype(np.float32)
    )
    mu0, lv0, _ = vae_mod.encode(params, state, x)
    mu1, lv1, _ = vae_mod.encode(params, state, x, fused_pool=True)
    np.testing.assert_allclose(np.asarray(mu1), np.asarray(mu0), atol=3e-5)
    np.testing.assert_allclose(np.asarray(lv1), np.asarray(lv0), atol=3e-5)
    # per-block selection also works
    mu2, _, _ = vae_mod.encode(
        params, state, x, fused_pool=(True, False, True, False)
    )
    np.testing.assert_allclose(np.asarray(mu2), np.asarray(mu0), atol=3e-5)


def test_encode_fused_pool_train_raises():
    params, state = vae_mod.init_vae_params(jax.random.key(0))
    x = jnp.zeros((2, 64, 64, 3))
    try:
        vae_mod.encode(params, state, x, train=True, fused_pool=True)
    except ValueError as e:
        assert "eval-mode" in str(e)
    else:
        raise AssertionError("expected ValueError for train+fused_pool")


def test_critic_fused_pool_matches_baseline():
    params = init_critic_params(jax.random.key(3))
    x = jnp.asarray(
        np.random.default_rng(4).random((5, 64, 64, 3)).astype(np.float32)
    )
    base = critic_apply(params, x)
    fused = critic_apply(params, x, fused_pool=True)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(base), atol=2e-6)
    # collect taps are post-pool values — unchanged by the fusion
    p0, e0 = critic_apply(params, x, collect=True)
    p1, e1 = critic_apply(params, x, collect=True, fused_pool=True)
    for a, b in zip(e0, e1):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-6)


def test_episode_forward_fused_pool_same_masks(critic_params):
    """End-to-end: the fused serving pipeline must produce the same uint8
    diff maps (±1 quantization level) and identical predictions."""
    from critic_vae_tpu.ops.mask import episode_forward, normalize_diffs

    vae_params, bn_state = vae_mod.init_vae_params(jax.random.key(1))
    frames = np.random.default_rng(5).random((8, 64, 64, 3)).astype(np.float32)
    base = episode_forward(
        vae_params, bn_state, critic_params, jnp.asarray(frames),
        with_recons=False,
    )
    fused = episode_forward(
        vae_params, bn_state, critic_params, jnp.asarray(frames),
        with_recons=False, fused_pool=True,
    )
    np.testing.assert_allclose(
        np.asarray(fused["preds"]), np.asarray(base["preds"]), atol=1e-5
    )
    d0, _ = normalize_diffs(base["diff"], base["max_value"])
    d1, _ = normalize_diffs(fused["diff"], fused["max_value"])
    agree = np.mean(
        np.abs(np.asarray(d0, np.int32) - np.asarray(d1, np.int32)) <= 1
    )
    assert agree > 0.999, agree


def test_encode_fold_bn_and_strided_pool_exact():
    """fold_bn folds the eval BN affine into conv weights; pool_impl=strided
    maxes the same candidate set — both must reproduce baseline encode()
    (negative BN scales included)."""
    params, state = vae_mod.init_vae_params(jax.random.key(5))
    for i in range(4):
        bn = params["encoder"][f"bn{i}"]
        c = bn["scale"].shape[0]
        params["encoder"][f"bn{i}"] = {
            "scale": jnp.asarray(np.where(np.arange(c) % 3, -1.1, 1.7), jnp.float32),
            "bias": bn["bias"] - 0.2,
        }
        state[f"bn{i}"] = {
            "mean": jnp.linspace(-0.1, 0.3, c),
            "var": jnp.linspace(0.4, 2.0, c),
        }
    x = jnp.asarray(
        np.random.default_rng(6).random((3, 64, 64, 3)).astype(np.float32)
    )
    mu0, lv0, _ = vae_mod.encode(params, state, x)
    for kw in (
        dict(fold_bn=True),
        dict(pool_impl="strided"),
        dict(fold_bn=True, pool_impl="strided"),
    ):
        mu1, lv1, _ = vae_mod.encode(params, state, x, **kw)
        np.testing.assert_allclose(np.asarray(mu1), np.asarray(mu0), atol=5e-5, err_msg=str(kw))
        np.testing.assert_allclose(np.asarray(lv1), np.asarray(lv0), atol=5e-5, err_msg=str(kw))
    try:
        vae_mod.encode(params, state, x, train=True, fold_bn=True)
    except ValueError as e:
        assert "eval-mode" in str(e)
    else:
        raise AssertionError("expected ValueError for train+fold_bn")
    try:
        vae_mod.encode(params, state, x, pool_impl="avg")
    except ValueError as e:
        assert "pool_impl" in str(e)
    else:
        raise AssertionError("expected ValueError for bad pool_impl")


def test_s2d_conv_pool_matches_reference_graph():
    """The space-to-depth 3×3 formulation must equal conv→pool for both
    first-block shapes (VAE 5×5 3→32, critic 3×3 3→8)."""
    from critic_vae_tpu.ops.poolconv import s2d_conv_pool2_phases

    rng = np.random.default_rng(7)
    for k, cin, cout, hw in [(5, 3, 32, 64), (3, 3, 8, 64), (5, 32, 64, 32)]:
        x = jnp.asarray(rng.normal(size=(2, hw, hw, cin)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(k, k, cin, cout)).astype(np.float32) * 0.1)
        b = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))
        ref = _maxpool2(_conv_same(x, w, b))
        fused = s2d_conv_pool2_phases(x, w).max(axis=3) + b
        np.testing.assert_allclose(
            np.asarray(fused), np.asarray(ref), atol=2e-5,
            err_msg=f"k={k} cin={cin}",
        )


def test_s2d_phase_layout_matches_packed():
    """s2d phases must be the same candidate set in the same order as
    conv_pool2_phases (so BN-per-phase/max downstream code is shared)."""
    from critic_vae_tpu.ops.poolconv import s2d_conv_pool2_phases

    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 3)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(5, 5, 3, 8)).astype(np.float32))
    a = np.asarray(conv_pool2_phases(x, w))
    b = np.asarray(s2d_conv_pool2_phases(x, w))
    np.testing.assert_allclose(b, a, atol=2e-5)


def test_encode_and_critic_s2d_match_baseline(critic_params):
    params, state = vae_mod.init_vae_params(jax.random.key(9))
    x = jnp.asarray(
        np.random.default_rng(10).random((3, 64, 64, 3)).astype(np.float32)
    )
    mu0, lv0, _ = vae_mod.encode(params, state, x)
    mu1, lv1, _ = vae_mod.encode(params, state, x, fused_pool=("s2d", False, False, False))
    np.testing.assert_allclose(np.asarray(mu1), np.asarray(mu0), atol=3e-5)
    np.testing.assert_allclose(np.asarray(lv1), np.asarray(lv0), atol=3e-5)
    # fused_pool=True resolves to the serving default, which includes s2d
    mu2, _, _ = vae_mod.encode(params, state, x, fused_pool=True)
    np.testing.assert_allclose(np.asarray(mu2), np.asarray(mu0), atol=3e-5)

    base = critic_apply(critic_params, x)
    s2d = critic_apply(critic_params, x, fused_pool="s2d")
    np.testing.assert_allclose(np.asarray(s2d), np.asarray(base), atol=2e-6)
