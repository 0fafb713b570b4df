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


# ---------------------------------------------------------------------------
# FiLM conditioning (round 3, opt-in — beyond the reference)
# ---------------------------------------------------------------------------


def test_film_zero_init_is_exactly_baseline(params_state):
    """film=True zero-initializes the modulation: decode must be bit-equal
    to the plain decoder with the same conv/linear weights at step 0."""
    base_params, _ = params_state
    film_params, _ = vae_mod.init_vae_params(jax.random.key(0), film=True)
    assert all(f"film{i}" in film_params["decoder"] for i in range(4))
    assert "film4" not in film_params["decoder"]  # output conv unmodulated
    z = jax.random.normal(jax.random.key(3), (5, 32))
    v = jnp.array([0.0, 0.25, 0.5, 0.75, 1.0])
    for fused in (True, False):
        a = vae_mod.decode(base_params, z, v, fused=fused)
        b = vae_mod.decode(film_params, z, v, fused=fused)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_film_modulation_is_live_and_path_consistent():
    """Nonzero film weights must change the output, respond to the value,
    and agree between the fused and literal decoder graphs."""
    params, _ = vae_mod.init_vae_params(jax.random.key(0), film=True)
    dec = dict(params["decoder"])
    for i in range(4):
        w = jax.random.normal(jax.random.key(10 + i), dec[f"film{i}"]["w"].shape)
        dec[f"film{i}"] = {"w": 0.1 * w, "b": dec[f"film{i}"]["b"]}
    params = dict(params, decoder=dec)
    z = jax.random.normal(jax.random.key(4), (3, 32))
    v = jnp.array([0.3, 0.6, 0.9])
    out = vae_mod.decode(params, z, v)
    base = vae_mod.decode(params, z, jnp.zeros_like(v))
    assert float(jnp.abs(out - base).max()) > 1e-4  # value pathway is live
    lit = vae_mod.decode(params, z, v, fused=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(lit), atol=2e-5)


def test_film_export_raises():
    params, state = vae_mod.init_vae_params(jax.random.key(0), film=True)
    with pytest.raises(ValueError, match="FiLM"):
        vae_mod.vae_state_dicts_to_torch(params, state)


def test_film_weights_roundtrip_autodetect(tmp_path):
    """save_final_weights → load_final_weights must auto-detect a FiLM
    decoder from the artifact and restore it losslessly, even when the
    caller's like-tree is the plain architecture."""
    from critic_vae_tpu.pipelines.train import load_final_weights, save_final_weights
    from critic_vae_tpu.train.step import TrainState, init_train_state

    state, _ = init_train_state(jax.random.key(0), film=True)
    dec = dict(state.params["decoder"])
    dec["film0"] = {
        "w": jnp.ones_like(dec["film0"]["w"]), "b": dec["film0"]["b"]
    }
    state = TrainState(
        dict(state.params, decoder=dec), state.bn_state, state.opt_state,
        state.rng, state.step,
    )
    enc_p = str(tmp_path / "enc.npz")
    dec_p = str(tmp_path / "dec.npz")
    save_final_weights(state, enc_p, dec_p)

    like_params, like_bn = vae_mod.init_vae_params(jax.random.key(1))  # plain
    params, bn = load_final_weights(enc_p, dec_p, like_params, like_bn)
    np.testing.assert_array_equal(
        np.asarray(params["decoder"]["film0"]["w"]),
        np.ones_like(np.asarray(state.params["decoder"]["film0"]["w"])),
    )
    z = jax.random.normal(jax.random.key(5), (2, 32))
    v = jnp.array([0.2, 0.8])
    np.testing.assert_array_equal(
        np.asarray(vae_mod.decode(params, z, v)),
        np.asarray(vae_mod.decode(state.params, z, v)),
    )


def test_load_pytree_rejects_structural_extras(tmp_path):
    """An artifact with leaves the target has no slot for must raise, not
    silently drop them (the film-into-plain hazard)."""
    from critic_vae_tpu.io import checkpoint as ckpt_io

    path = str(tmp_path / "t.npz")
    ckpt_io.save_pytree(path, {"a": np.zeros(3), "extra": np.ones(2)})
    with pytest.raises(ValueError, match="no slot"):
        ckpt_io.load_pytree(path, {"a": np.zeros(3)})
