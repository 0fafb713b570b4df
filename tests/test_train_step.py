"""Train-step tests: loss descent, determinism, and DP mesh equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from critic_vae_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from critic_vae_tpu.train.step import init_train_state, make_train_step
from tests.conftest import requires_reference


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(0)
    return rng.random((16, 64, 64, 3), dtype=np.float32)


@requires_reference
def test_loss_decreases(critic_params, batch):
    state, tx = init_train_state(jax.random.key(0))
    step = make_train_step(critic_params, tx, donate=False)
    first = None
    b = jnp.asarray(batch)
    for i in range(30):
        state, metrics = step(state, b)
        if first is None:
            first = float(metrics["total_loss"])
    last = float(metrics["total_loss"])
    assert np.isfinite(last)
    assert last < first, (first, last)


@requires_reference
def test_bn_state_and_step_advance(critic_params, batch):
    state, tx = init_train_state(jax.random.key(0))
    step = make_train_step(critic_params, tx, donate=False)
    new_state, _ = step(state, jnp.asarray(batch))
    assert int(new_state.step) == 1
    before = jax.tree.leaves(state.bn_state)
    after = jax.tree.leaves(new_state.bn_state)
    assert any(not np.array_equal(a, b) for a, b in zip(before, after))


@requires_reference
def test_data_parallel_equivalence(critic_params, batch):
    """A DP step over the 8-device mesh must match the single-device step:
    same params, same loss (global BN stats + allreduced grads ⇒ identical
    math, SURVEY §4c)."""
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    mesh = make_mesh(8)

    state1, tx = init_train_state(jax.random.key(0))
    step1 = make_train_step(critic_params, tx, donate=False)
    state8 = replicate(mesh, jax.tree.map(jnp.copy, state1))
    critic8 = replicate(mesh, critic_params)
    step8 = make_train_step(critic8, tx, mesh=mesh, donate=False)

    b1 = jnp.asarray(batch)
    b8 = shard_batch(mesh, batch)
    with jax.default_matmul_precision("highest"):
        for _ in range(3):
            state1, m1 = step1(state1, b1)
            state8, m8 = step8(state8, b8)
    np.testing.assert_allclose(
        float(m1["total_loss"]), float(m8["total_loss"]), rtol=2e-4
    )
    for a, b in zip(jax.tree.leaves(state1.params), jax.tree.leaves(state8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


@requires_reference
def test_deterministic_given_same_state(critic_params, batch):
    s0, tx = init_train_state(jax.random.key(0))
    step = make_train_step(critic_params, tx, donate=False)
    b = jnp.asarray(batch)
    a1, m1 = step(jax.tree.map(jnp.copy, s0), b)
    a2, m2 = step(jax.tree.map(jnp.copy, s0), b)
    assert float(m1["total_loss"]) == float(m2["total_loss"])
    for x, y in zip(jax.tree.leaves(a1.params), jax.tree.leaves(a2.params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@requires_reference
def test_nonfinite_batch_does_not_poison_params(critic_params):
    """A NaN batch must be skipped by apply_if_finite, leaving params
    finite and unchanged (the reference trains straight into NaN)."""
    state, tx = init_train_state(jax.random.key(0))
    step = make_train_step(critic_params, tx, donate=False)
    bad = jnp.full((8, 64, 64, 3), jnp.nan)
    before = jax.tree.leaves(state.params)
    state2, metrics = step(state, bad)
    after = jax.tree.leaves(state2.params)
    for a, b in zip(before, after):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    good = jnp.zeros((8, 64, 64, 3))
    state3, metrics = step(state2, good)
    assert np.isfinite(float(metrics["total_loss"]))
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(state3.params))


@requires_reference
def test_bf16_step_descends_and_keeps_f32_state(critic_params, batch):
    """bfloat16 compute: loss must still descend; params/opt/BN stay f32."""
    state, tx = init_train_state(jax.random.key(0))
    step = make_train_step(
        critic_params, tx, donate=False, compute_dtype=jnp.bfloat16
    )
    first = None
    b = jnp.asarray(batch)
    for _ in range(30):
        state, metrics = step(state, b)
        if first is None:
            first = float(metrics["total_loss"])
    assert np.isfinite(float(metrics["total_loss"]))
    assert float(metrics["total_loss"]) < first
    assert all(
        leaf.dtype == jnp.float32 for leaf in jax.tree.leaves(state.params)
    )
    assert all(
        leaf.dtype == jnp.float32 for leaf in jax.tree.leaves(state.bn_state)
    )


@requires_reference
def test_nonfinite_batch_does_not_poison_bn_state(critic_params):
    """BatchNorm running stats are committed outside apply_if_finite's reach;
    a NaN batch must leave them untouched too (they ship in the final
    encoder checkpoint)."""
    state, tx = init_train_state(jax.random.key(0))
    step = make_train_step(critic_params, tx, donate=False)
    bad = jnp.full((8, 64, 64, 3), jnp.nan)
    before = jax.tree.leaves(state.bn_state)
    state2, _ = step(state, bad)
    for a, b in zip(before, jax.tree.leaves(state2.bn_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # RNG still advances: a skipped batch must not replay identical noise
    assert not np.array_equal(
        jax.random.key_data(state.rng), jax.random.key_data(state2.rng)
    )


@requires_reference
def test_remat_step_matches_plain(critic_params, batch):
    """jax.checkpoint rematerialization must not change the math."""
    s0, tx = init_train_state(jax.random.key(0))
    plain = make_train_step(critic_params, tx, donate=False)
    remat = make_train_step(critic_params, tx, donate=False, remat=True)
    b = jnp.asarray(batch)
    with jax.default_matmul_precision("highest"):
        a1, m1 = plain(jax.tree.map(jnp.copy, s0), b)
        a2, m2 = remat(jax.tree.map(jnp.copy, s0), b)
    np.testing.assert_allclose(
        float(m1["total_loss"]), float(m2["total_loss"]), rtol=1e-6
    )
    for x, y in zip(jax.tree.leaves(a1.params), jax.tree.leaves(a2.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)


@requires_reference
def test_value_consistency_term(critic_params, batch):
    """Opt-in critic-grounded conditioning loss (round 3): with weight > 0
    the step reports a finite vc_loss folded into total_loss, trains to
    different parameters than the plain objective, and weight 0 reproduces
    the reference-faithful objective exactly."""
    s0, tx = init_train_state(jax.random.key(0))
    plain = make_train_step(critic_params, tx, donate=False)
    vc = make_train_step(critic_params, tx, donate=False,
                         value_consistency=0.1)
    b = jnp.asarray(batch)
    a1, m1 = plain(jax.tree.map(jnp.copy, s0), b)
    a2, m2 = vc(jax.tree.map(jnp.copy, s0), b)
    assert "vc_loss" not in m1
    assert np.isfinite(float(m2["vc_loss"])) and float(m2["vc_loss"]) > 0
    np.testing.assert_allclose(
        float(m2["total_loss"]),
        float(m2["recon_loss"]) + float(m2["kld"]) + float(m2["vc_loss"]),
        rtol=1e-6,
    )
    # the auxiliary gradient actually moves the decoder
    diffs = [
        np.abs(np.asarray(x) - np.asarray(y)).max()
        for x, y in zip(jax.tree.leaves(a1.params), jax.tree.leaves(a2.params))
    ]
    assert max(diffs) > 0

    # weight 0 == the plain objective, bit-for-bit
    vc0 = make_train_step(critic_params, tx, donate=False,
                          value_consistency=0.0)
    a3, m3 = vc0(jax.tree.map(jnp.copy, s0), b)
    np.testing.assert_array_equal(
        np.asarray(m1["total_loss"]), np.asarray(m3["total_loss"])
    )


def test_film_training_moves_film_params(critic_params, batch):
    """train --film: the FiLM pathway must receive gradient (zero-init does
    not mean zero-gradient — the value input is nonzero) and the step must
    stay finite. Combined with the vc term, the two quality options compose."""
    state, tx = init_train_state(jax.random.key(0), film=True)
    step = make_train_step(critic_params, tx, donate=False,
                           value_consistency=0.1)
    b = jnp.asarray(batch)
    for _ in range(3):
        state, metrics = step(state, b)
    assert np.isfinite(float(metrics["total_loss"]))
    film_w = np.asarray(state.params["decoder"]["film0"]["w"])
    assert np.abs(film_w).max() > 0, "film params never received gradient"


@requires_reference
def test_sharded_dataset_multi_step_matches_replicated(critic_params):
    """make_sharded_multi_step (dataset sharded over the mesh, local
    gathers) must reproduce make_multi_step (dataset replicated) given the
    equivalent global indices — HBM capacity now scales with chips at
    unchanged math (VERDICT r3 #6)."""
    from critic_vae_tpu.parallel.mesh import device_put_global
    from critic_vae_tpu.train.step import (
        make_multi_step,
        make_sharded_multi_step,
        sharded_epoch_indices,
    )
    from jax.sharding import PartitionSpec as P

    assert jax.device_count() >= 8
    mesh = make_mesh(8)
    n, bsz, ndev = 64, 16, 8
    dataset = np.random.default_rng(3).random((n, 64, 64, 3), dtype=np.float32)

    rng = np.random.default_rng(0)
    idx_local = sharded_epoch_indices(rng, n, bsz, ndev)
    assert idx_local.shape == (4, 16)  # S=8 rows/device, 2/batch → 4 steps
    s, pb = n // ndev, bsz // ndev
    # equivalent GLOBAL indices for the replicated driver: offset each
    # device-block column by its shard's base row
    owner_base = np.repeat(np.arange(ndev) * s, pb)[None, :]
    idx_global = (idx_local + owner_base).astype(np.int32)

    state0, tx = init_train_state(jax.random.key(1))
    critic8 = replicate(mesh, critic_params)

    repl_step = make_multi_step(critic8, tx, mesh=mesh, donate=False)
    st_r = replicate(mesh, jax.tree.map(jnp.copy, state0))
    st_r, m_r = repl_step(
        st_r, replicate(mesh, dataset),
        device_put_global(mesh, idx_global, P(None, "data")),
    )

    sh_step = make_sharded_multi_step(critic8, tx, mesh=mesh, donate=False)
    ds_sh = device_put_global(mesh, dataset, P("data", None, None, None))
    # the sharded dataset must actually be sharded: N/8 rows per device
    assert all(
        sh.data.shape[0] == s for sh in ds_sh.addressable_shards
    )
    st_s = replicate(mesh, jax.tree.map(jnp.copy, state0))
    st_s, m_s = sh_step(
        st_s, ds_sh, device_put_global(mesh, idx_local, P(None, "data"))
    )

    np.testing.assert_allclose(
        np.asarray(m_s["total_loss"]), np.asarray(m_r["total_loss"]),
        rtol=2e-5, atol=2e-6,
    )
    for a, b in zip(jax.tree.leaves(st_s.params), jax.tree.leaves(st_r.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6
        )


def test_sharded_epoch_indices_validation_and_coverage():
    from critic_vae_tpu.train.step import sharded_epoch_indices

    rng = np.random.default_rng(5)
    idx = sharded_epoch_indices(rng, 64, 16, 8)
    # every local offset in range; each device column-block covers its shard
    assert idx.min() >= 0 and idx.max() < 8
    for d in range(8):
        block = idx[:, d * 2 : (d + 1) * 2].ravel()
        assert sorted(block.tolist()) == list(range(8))  # full epoch coverage
    with pytest.raises(ValueError, match="divide over"):
        sharded_epoch_indices(rng, 64, 15, 8)
    with pytest.raises(ValueError, match="divisible by the mesh"):
        sharded_epoch_indices(rng, 63, 16, 8)
    with pytest.raises(ValueError, match="smaller than the per-device"):
        sharded_epoch_indices(rng, 8, 16, 8)


@requires_reference
def test_mask_distill_term_active_and_targeted(critic_params, batch):
    """The self-distillation Dice term must appear in the metrics, raise the
    total, and actually pull the diff signal toward the pseudo-masks:
    training with a fixed mask should reduce md_loss."""
    from critic_vae_tpu.train.step import make_train_step

    masks = np.zeros((16, 64, 64), np.uint8)
    masks[:, 20:44, 20:44] = 1
    state, tx = init_train_state(jax.random.key(0))
    step = make_train_step(critic_params, tx, donate=False, mask_distill=0.5)
    b, m = jnp.asarray(batch), jnp.asarray(masks)
    first = None
    for _ in range(25):
        state, metrics = step(state, b, m)
        if first is None:
            first = float(metrics["md_loss"])
    last = float(metrics["md_loss"])
    assert np.isfinite(last) and 0.0 < first
    assert last < first, (first, last)
    # total includes the term
    assert float(metrics["total_loss"]) >= float(metrics["md_loss"])


@requires_reference
def test_mask_distill_multi_step_gathers_rows(critic_params):
    """multi_step with mask_distill gathers pseudo-mask rows with the same
    indices as the batch (row alignment)."""
    from critic_vae_tpu.train.step import make_multi_step

    n = 32
    dataset = np.random.default_rng(0).random((n, 64, 64, 3), dtype=np.float32)
    masks = np.zeros((n, 64, 64), np.uint8)
    masks[:, 8:56, 8:56] = 1
    state, tx = init_train_state(jax.random.key(2))
    ms = make_multi_step(critic_params, tx, donate=False, mask_distill=0.3)
    idx = np.arange(32, dtype=np.int32).reshape(2, 16)
    state, metrics = ms(state, jnp.asarray(dataset), jnp.asarray(idx), jnp.asarray(masks))
    assert metrics["md_loss"].shape == (2,)
    assert np.all(np.isfinite(np.asarray(metrics["md_loss"])))


def test_train_pipeline_mask_distill_validation():
    from critic_vae_tpu.models.critic import init_critic_params
    from critic_vae_tpu.pipelines.train import train

    critic = init_critic_params(jax.random.key(0))
    data = np.random.default_rng(1).random((8, 64, 64, 3), dtype=np.float32)
    with pytest.raises(ValueError, match="requires pseudo_masks"):
        train(critic, data, epochs=1, batch_size=4, mask_distill=0.1,
              use_mesh=False, resume=False, progress=False)
    with pytest.raises(ValueError, match="row-aligned"):
        train(critic, data, epochs=1, batch_size=4, mask_distill=0.1,
              pseudo_masks=np.zeros((4, 64, 64)), use_mesh=False,
              resume=False, progress=False)
