"""Phase-decomposed upsample+conv must equal the literal graph exactly."""

import jax
import jax.numpy as jnp
import numpy as np

from critic_vae_tpu.models import vae as vae_mod
from critic_vae_tpu.ops.upconv import upsample2_conv5


def _literal(x, w, b):
    up = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    y = jax.lax.conv_general_dilated(
        up, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    return y + b


def test_matches_literal_repeat_conv():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(3, 8, 8, 16)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(5, 5, 16, 12)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(12,)).astype(np.float32))
    with jax.default_matmul_precision("highest"):
        fused = upsample2_conv5(x, w, b)
        lit = _literal(x, w, b)
    assert fused.shape == (3, 16, 16, 12)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(lit), atol=2e-4)


def test_matches_at_odd_sizes_and_edges():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 5, 7, 4)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(5, 5, 4, 2)).astype(np.float32))
    b = jnp.zeros((2,), jnp.float32)
    with jax.default_matmul_precision("highest"):
        np.testing.assert_allclose(
            np.asarray(upsample2_conv5(x, w, b)),
            np.asarray(_literal(x, w, b)),
            atol=2e-4,
        )


def test_decode_fused_equals_unfused():
    params, _ = vae_mod.init_vae_params(jax.random.key(0))
    z = jax.random.normal(jax.random.key(1), (4, 32))
    v = jax.random.uniform(jax.random.key(2), (4,))
    with jax.default_matmul_precision("highest"):
        a = vae_mod.decode(params, z, v, fused=True)
        b = vae_mod.decode(params, z, v, fused=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_gradients_match():
    params, _ = vae_mod.init_vae_params(jax.random.key(0))
    z = jax.random.normal(jax.random.key(1), (2, 32))
    v = jnp.zeros((2,))

    def loss(p, fused):
        return jnp.sum(vae_mod.decode(p, z, v, fused=fused) ** 2)

    with jax.default_matmul_precision("highest"):
        ga = jax.grad(lambda p: loss({"decoder": p["decoder"], "encoder": params["encoder"]}, True))(params)
        gb = jax.grad(lambda p: loss({"decoder": p["decoder"], "encoder": params["encoder"]}, False))(params)
    for a, b in zip(jax.tree.leaves(ga["decoder"]), jax.tree.leaves(gb["decoder"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4)
