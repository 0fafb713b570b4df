"""MS-SSIM loss tests, including parity with the reference's quirky torch impl."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from critic_vae_tpu.ops.losses import kld_loss, vae_loss
from critic_vae_tpu.ops.msssim import msssim_loss, window_1d
from tests.conftest import requires_reference, requires_torch


def test_faithful_window_is_edge_weighted():
    """Quirk (1): missing minus sign ⇒ edge-weighted kernel (vae_nets.py:171),
    values verified numerically in SURVEY §2.1 #7."""
    k = window_1d(True)
    np.testing.assert_allclose(k[0], 0.42370537, atol=1e-6)
    np.testing.assert_allclose(k[1], 0.05734229, atol=1e-6)
    assert k[0] > k[5]  # edges dominate the center
    np.testing.assert_allclose(k.sum(), 1.0, atol=1e-6)


def test_correct_window_is_gaussian():
    k = window_1d(False)
    assert k[5] == k.max()  # center-peaked
    np.testing.assert_allclose(k.sum(), 1.0, atol=1e-6)


def test_identical_images_zero_loss():
    x = jax.random.uniform(jax.random.key(0), (2, 64, 64, 3))
    assert abs(float(msssim_loss(x, x))) < 1e-6
    assert abs(float(msssim_loss(x, x, faithful=False))) < 1e-6


def test_loss_increases_with_distortion():
    x = jax.random.uniform(jax.random.key(0), (2, 64, 64, 3))
    k1, k2 = jax.random.split(jax.random.key(1))
    small = jnp.clip(x + 0.02 * jax.random.normal(k1, x.shape), 0, 1)
    large = jnp.clip(x + 0.3 * jax.random.normal(k2, x.shape), 0, 1)
    assert float(msssim_loss(x, small)) < float(msssim_loss(x, large))


def test_faithful_and_correct_differ():
    x = jax.random.uniform(jax.random.key(2), (2, 64, 64, 3))
    y = jnp.clip(x + 0.1, 0, 1)
    a = float(msssim_loss(x, y, faithful=True))
    b = float(msssim_loss(x, y, faithful=False))
    assert abs(a - b) > 1e-4


def test_differentiable():
    x = jax.random.uniform(jax.random.key(3), (2, 32, 32, 3))
    y = jax.random.uniform(jax.random.key(4), (2, 32, 32, 3))
    g = jax.grad(lambda a: msssim_loss(a, y))(x)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0


@requires_reference
@requires_torch
@pytest.mark.parametrize("noise", [0.02, 0.1, 0.5])
def test_parity_vs_torch_reference(noise):
    import sys

    import torch

    sys.path.insert(0, "/root/reference")
    from vae_nets import MSSIM

    rng = np.random.default_rng(42)
    a = rng.random((4, 64, 64, 3), dtype=np.float32)
    b = np.clip(a + rng.normal(0, noise, a.shape).astype(np.float32), 0, 1)
    with torch.no_grad():
        ref = MSSIM()(
            torch.from_numpy(a.transpose(0, 3, 1, 2)),
            torch.from_numpy(b.transpose(0, 3, 1, 2)),
        ).item()
    with jax.default_matmul_precision("highest"):
        ours = float(msssim_loss(jnp.asarray(a), jnp.asarray(b)))
    assert abs(ours - ref) < 5e-5


def test_kld_matches_reference_formula():
    """KLD = mean_batch(-0.5·Σ(1+logvar−mu²−e^logvar)) (vae_nets.py:57)."""
    rng = np.random.default_rng(1)
    mu = rng.normal(size=(8, 32)).astype(np.float32)
    logvar = rng.normal(scale=0.3, size=(8, 32)).astype(np.float32)
    expected = np.mean(
        -0.5 * np.sum(1 + logvar - mu**2 - np.exp(logvar), axis=1)
    )
    np.testing.assert_allclose(
        float(kld_loss(jnp.asarray(mu), jnp.asarray(logvar))), expected, rtol=1e-5
    )


def test_vae_loss_composition():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.random((2, 64, 64, 3), dtype=np.float32))
    recon = jnp.clip(x + 0.05, 0, 1)
    mu = jnp.asarray(rng.normal(size=(2, 32)).astype(np.float32))
    logvar = jnp.zeros((2, 32))
    out = vae_loss(x, mu, logvar, recon, kld_weight=1e-3)
    np.testing.assert_allclose(
        float(out["total_loss"]),
        float(out["recon_loss"]) + float(out["kld"]),
        rtol=1e-6,
    )


def test_clamp_survives_negative_correlation():
    """Anti-correlated images produce negative CS; faithful+clamp must stay
    finite where the reference's torch code NaNs (vae_nets.py:243-246)."""
    x = jax.random.uniform(jax.random.key(5), (2, 64, 64, 3))
    y = 1.0 - x  # strongly anti-correlated
    loss = float(msssim_loss(x, y, faithful=True, clamp=True))
    assert np.isfinite(loss)
    g = jax.grad(lambda a: msssim_loss(a, y, faithful=True, clamp=True))(x)
    assert np.isfinite(np.asarray(g)).all()


def test_clamp_is_identity_in_normal_regime():
    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.random((2, 64, 64, 3), dtype=np.float32))
    b = jnp.clip(a + 0.05, 0, 1)
    with jax.default_matmul_precision("highest"):
        clamped = float(msssim_loss(a, b, clamp=True))
        raw = float(msssim_loss(a, b, clamp=False))
    assert abs(clamped - raw) < 1e-7


def test_clamp_gradient_flows_in_clamped_regime():
    """The straight-through floor must keep a recovery gradient when
    SSIM/CS are negative — a hard clamp strands training at loss ≈ 1."""
    x = jax.random.uniform(jax.random.key(5), (2, 64, 64, 3))
    y = 1.0 - x  # anti-correlated → negative CS → clamped regime
    g = jax.grad(lambda a: msssim_loss(a, y, faithful=True, clamp=True))(x)
    g = np.asarray(g)
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 1e-8, "gradient died in the clamped regime"
