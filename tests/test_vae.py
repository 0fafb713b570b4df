"""VAE model tests: shapes, statistics, parity with the torch reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from critic_vae_tpu.models import vae as vae_mod
from tests.conftest import requires_reference, requires_torch


@pytest.fixture(scope="module")
def params_state():
    return vae_mod.init_vae_params(jax.random.key(0))


def test_param_count(params_state):
    params, _ = params_state
    # analytic reference count: enc 1,341,248 / dec 1,242,723 (SURVEY §2.1 #5)
    assert vae_mod.param_count(params["encoder"]) == 1_341_248
    assert vae_mod.param_count(params["decoder"]) == 1_242_723
    assert vae_mod.param_count(params) == 2_583_971


def test_shapes(params_state):
    params, state = params_state
    x = jnp.zeros((6, 64, 64, 3))
    mu, logvar, new_state = vae_mod.encode(params, state, x, train=True)
    assert mu.shape == (6, 32) and logvar.shape == (6, 32)
    assert jax.tree.structure(new_state) == jax.tree.structure(state)
    recon = vae_mod.decode(params, mu, jnp.zeros((6,)))
    assert recon.shape == (6, 64, 64, 3)
    assert np.all(np.abs(np.asarray(recon)) <= 1.0)  # final tanh


def test_reparametrize_statistics():
    key = jax.random.key(7)
    mu = jnp.full((20000, 4), 1.5)
    logvar = jnp.full((20000, 4), jnp.log(0.25))  # std 0.5
    z = vae_mod.reparametrize(key, mu, logvar)
    assert abs(float(z.mean()) - 1.5) < 0.01
    assert abs(float(z.std()) - 0.5) < 0.01


def test_inject_matches_individual_decodes(params_state):
    """Batched inject must equal the reference's per-value decode loop
    (vae_nets.py:31-40)."""
    params, state = params_state
    x = jax.random.uniform(jax.random.key(1), (3, 64, 64, 3))
    values = jnp.array([0.0, 0.2, 0.4, 0.6, 0.8, 1.0])
    out = vae_mod.inject(params, state, x, values)
    assert out.shape == (3, 6, 64, 64, 3)
    mu, _, _ = vae_mod.encode(params, state, x, train=False)
    for k in range(6):
        ref = vae_mod.decode(params, mu, jnp.full((3,), values[k]))
        np.testing.assert_allclose(np.asarray(out[:, k]), np.asarray(ref), atol=1e-5)


def test_value_injection_changes_output(params_state):
    """The critic-value concat (vae_nets.py:143) must actually condition the
    decoder: different injected values → different reconstructions."""
    params, state = params_state
    z = jax.random.normal(jax.random.key(2), (2, 32))
    r0 = vae_mod.decode(params, z, jnp.zeros((2,)))
    r1 = vae_mod.decode(params, z, jnp.ones((2,)))
    assert float(jnp.abs(r0 - r1).max()) > 1e-4


def test_batchnorm_train_vs_eval(params_state):
    params, state = params_state
    x = jax.random.uniform(jax.random.key(3), (8, 64, 64, 3))
    mu_t, _, new_state = vae_mod.encode(params, state, x, train=True)
    mu_e, _, same_state = vae_mod.encode(params, state, x, train=False)
    # train-mode normalizes by batch stats → different activations
    assert float(jnp.abs(mu_t - mu_e).max()) > 1e-5
    # eval mode must not touch running stats
    assert all(
        np.array_equal(a, b)
        for a, b in zip(jax.tree.leaves(same_state), jax.tree.leaves(state))
    )
    # train mode must move them
    assert any(
        not np.array_equal(a, b)
        for a, b in zip(jax.tree.leaves(new_state), jax.tree.leaves(state))
    )


@requires_reference
@requires_torch
def test_parity_vs_torch_reference():
    """Random torch reference VAE → ingested params → identical eval outputs.

    Exercises the full layout bridge: OIHW→HWIO convs, channel-major
    flatten/unflatten, BN running stats, fc transposes.
    """
    import sys

    import torch

    sys.path.insert(0, "/root/reference")
    from vae_nets import VariationalAutoencoder

    torch.manual_seed(0)
    tvae = VariationalAutoencoder()
    # randomize BN running stats so eval mode exercises them
    for m in tvae.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.uniform_(-0.5, 0.5)
            m.running_var.uniform_(0.5, 1.5)
    tvae.eval()

    enc_sd = {k: v.numpy() for k, v in tvae.encoder.state_dict().items()}
    dec_sd = {k: v.numpy() for k, v in tvae.decoder.state_dict().items()}
    params, state = vae_mod.vae_params_from_torch(enc_sd, dec_sd)

    rng = np.random.default_rng(0)
    x = rng.random((4, 64, 64, 3), dtype=np.float32)
    pred = rng.random((4, 1), dtype=np.float32)

    with torch.no_grad():
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        t_mu, t_logvar = tvae.encoder(xt)
        t_recon = tvae.decoder(t_mu, torch.from_numpy(pred))

    with jax.default_matmul_precision("highest"):
        mu, logvar, _ = vae_mod.encode(params, state, jnp.asarray(x), train=False)
        recon = vae_mod.decode(params, mu, jnp.asarray(pred))

    np.testing.assert_allclose(np.asarray(mu), t_mu.numpy(), atol=3e-5)
    np.testing.assert_allclose(np.asarray(logvar), t_logvar.numpy(), atol=3e-5)
    np.testing.assert_allclose(
        np.asarray(recon).transpose(0, 3, 1, 2), t_recon.numpy(), atol=3e-4
    )
