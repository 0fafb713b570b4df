"""Fused diff-mask Pallas kernel vs the plain XLA formulation."""

import jax
import jax.numpy as jnp
import numpy as np

from critic_vae_tpu.models import vae as vae_mod
from critic_vae_tpu.ops.mask import REC601, diff_images
from critic_vae_tpu.ops.pallas_kernels import fused_diff_mask


def _xla_reference(pre_one, pre_zero):
    d = jnp.abs(jnp.tanh(pre_zero) - jnp.tanh(pre_one))
    grey = d[..., 0] * REC601[0] + d[..., 1] * REC601[1] + d[..., 2] * REC601[2]
    return grey, jnp.max(grey, axis=(1, 2))


def test_kernel_matches_xla():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(5, 64, 64, 3)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(5, 64, 64, 3)).astype(np.float32))
    grey_k, max_k = fused_diff_mask(a, b)
    grey_r, max_r = _xla_reference(a, b)
    assert grey_k.shape == (5, 64, 64) and max_k.shape == (5,)
    np.testing.assert_allclose(np.asarray(grey_k), np.asarray(grey_r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(max_k), np.asarray(max_r), atol=1e-5)


def test_kernel_handles_tile_multiple():
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.normal(size=(64, 64, 64, 3)).astype(np.float32))
    b = a + 0.1
    grey_k, max_k = fused_diff_mask(a, b)
    grey_r, max_r = _xla_reference(a, b)
    np.testing.assert_allclose(np.asarray(grey_k), np.asarray(grey_r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(max_k), np.asarray(max_r), atol=1e-5)


def test_diff_images_pallas_equals_xla_path():
    params, state = vae_mod.init_vae_params(jax.random.key(0))
    x = jax.random.uniform(jax.random.key(1), (6, 64, 64, 3))
    v = jax.random.uniform(jax.random.key(2), (6,))
    ro_p, rz_p, grey_p, max_p = diff_images(params, state, x, v, use_pallas=True)
    ro_x, rz_x, grey_x, max_x = diff_images(params, state, x, v, use_pallas=False)
    np.testing.assert_allclose(np.asarray(ro_p), np.asarray(ro_x), atol=1e-6)
    np.testing.assert_allclose(np.asarray(grey_p), np.asarray(grey_x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(max_p), np.asarray(max_x), atol=1e-5)


def test_bfloat16_inputs():
    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.normal(size=(4, 64, 64, 3)).astype(np.float32), jnp.bfloat16)
    b = jnp.asarray(rng.normal(size=(4, 64, 64, 3)).astype(np.float32), jnp.bfloat16)
    grey_k, max_k = fused_diff_mask(a, b)
    assert grey_k.dtype == jnp.float32  # kernel upcasts internally
    grey_r, max_r = _xla_reference(a.astype(jnp.float32), b.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(grey_k), np.asarray(grey_r), atol=1e-5)
