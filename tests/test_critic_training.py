"""Critic-training tests (framework-native capability beyond the reference)."""

import jax
import jax.numpy as jnp
import numpy as np

from critic_vae_tpu.data.synthetic import generate_frames
from critic_vae_tpu.models.critic import (
    critic_apply,
    init_critic_params,
    load_critic,
    save_critic,
)
from critic_vae_tpu.train.critic import (
    critic_accuracy,
    labels_from_masks,
    train_critic,
)


def test_init_params_shapes_match_pretrained_format():
    params = init_critic_params(jax.random.key(0))
    assert params["conv0_w"].shape == (3, 3, 3, 8)
    assert params["conv4_w"].shape == (4, 4, 16, 32)
    assert params["fc1_w"].shape == (32, 1)
    total = sum(int(np.prod(p.shape)) for p in params.values())
    assert total == 11_873  # same architecture as the bundled critics


def test_dropout_active_only_in_train_mode():
    params = init_critic_params(jax.random.key(0))
    x = jax.random.uniform(jax.random.key(1), (4, 64, 64, 3))
    eval1 = critic_apply(params, x)
    eval2 = critic_apply(params, x)
    np.testing.assert_array_equal(np.asarray(eval1), np.asarray(eval2))
    t1 = critic_apply(params, x, train=True, rng=jax.random.key(2))
    t2 = critic_apply(params, x, train=True, rng=jax.random.key(3))
    assert float(jnp.abs(t1 - t2).max()) > 1e-6


def test_labels_from_masks():
    gt = np.zeros((3, 8, 8), bool)
    gt[1, 2, 2] = True
    gt[2, :4] = True
    np.testing.assert_array_equal(labels_from_masks(gt), [0.0, 1.0, 1.0])
    np.testing.assert_array_equal(labels_from_masks(gt, min_pixels=2), [0.0, 0.0, 1.0])


def test_training_learns_synthetic_trunks():
    frames, gt = generate_frames(1024, seed=0)
    labels = labels_from_masks(gt)
    params, loss = train_critic(
        frames, labels, epochs=12, batch_size=128, learning_rate=2e-3,
        dropout_rate=0.1, progress=False,
    )
    assert np.isfinite(loss)
    hf, hg = generate_frames(256, seed=321)
    acc = critic_accuracy(params, hf, labels_from_masks(hg))
    assert acc > 0.75, acc


def test_save_load_npz_roundtrip(tmp_path):
    params = init_critic_params(jax.random.key(0))
    p = str(tmp_path / "critic.npz")
    save_critic(p, params)
    out = load_critic(p)
    assert set(out) == set(params)
    x = jax.random.uniform(jax.random.key(1), (2, 64, 64, 3))
    np.testing.assert_allclose(
        np.asarray(critic_apply(params, x)), np.asarray(critic_apply(out, x)), atol=1e-7
    )


def test_soft_trunk_labels_semantics():
    from critic_vae_tpu.train.critic import soft_trunk_labels

    gt = np.zeros((4, 8, 8), bool)
    gt[1, :2, :2] = True   # 4 px
    gt[2, :4, :4] = True   # 16 px
    gt[3] = True           # 64 px
    y = soft_trunk_labels(gt, percentile=100.0)
    assert y[0] == 0.0
    assert 0 < y[1] < y[2] < y[3] == 1.0
    np.testing.assert_allclose(y[1], 4 / 64)
    # all-empty GT must not divide by zero
    np.testing.assert_array_equal(
        soft_trunk_labels(np.zeros((3, 8, 8), bool)), np.zeros(3))


def test_cam_health_on_bundled_critic():
    """Pin the no-GT health gate (round 5, VERDICT r4 #1): the
    CAM-validated bundled critic must PASS critic_cam_health's
    deletion_drop gate on the synthetic episode — the same measurement
    that separates it (0.42) from a degenerate 1.000-accuracy fresh
    critic (0.08); docs/artifacts/cam_health.json."""
    import os

    from critic_vae_tpu.models.critic import load_critic
    from critic_vae_tpu.train.critic import (
        CAM_HEALTH_MIN_DELETION_DROP,
        critic_cam_health,
    )

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    critic = load_critic(
        os.path.join(repo, "saved-networks", "critic-synthetic.npz"))
    frames, _ = generate_frames(128, seed=9999)
    h = critic_cam_health(critic, frames, max_frames=128)
    assert set(h) >= {"deletion_drop", "empty_rate", "positive_fraction",
                      "cam_top5_mass"}
    assert h["positive_fraction"] > 0.2
    assert h["deletion_drop"] >= CAM_HEALTH_MIN_DELETION_DROP, h
    assert h["empty_rate"] <= 0.2, h


def test_gated_bundled_critic_passes_strict_gate():
    """Pin the CAM-GRADE bundled critic (round 5): the health-target retry
    recipe's selected instance (seed 208 of the soft15 sweep,
    docs/artifacts/cam_health_target.json — its TTA chain measured
    0.64/0.96 thr/CRF IoU, beating the round-4 flagship 0.58/0.84) ships
    at saved-networks/critic-synthetic-gated.npz and must keep passing the
    strict deletion_drop gate it was selected by (0.668 measured at this
    exact 128-frame scale on CPU; asserted with margin)."""
    import os

    from critic_vae_tpu.models.critic import load_critic
    from critic_vae_tpu.train.critic import (
        CAM_HEALTH_MIN_DELETION_DROP,
        CAM_HEALTH_TARGET_STRICT,
        critic_cam_health,
    )

    assert CAM_HEALTH_TARGET_STRICT > CAM_HEALTH_MIN_DELETION_DROP
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    critic = load_critic(
        os.path.join(repo, "saved-networks", "critic-synthetic-gated.npz"))
    frames, _ = generate_frames(128, seed=9999)
    h = critic_cam_health(critic, frames, max_frames=128)
    assert h["deletion_drop"] >= 0.5, h
    assert h["empty_rate"] <= 0.05, h


def test_train_critic_selected_health_target(monkeypatch):
    """health_target semantics (round 5): early-stop on the FIRST candidate
    reaching the target; argmax + health_target_met=False when none does;
    unchanged fixed-pool argmax when no target is given. Training and
    health are scripted per seed so the selection logic is exercised
    without real training."""
    from critic_vae_tpu.train import critic as tc

    drops = {0: 0.30, 1: 0.70, 2: 0.90, 3: 0.10}
    trained = []

    def fake_train(frames, labels, *, seed, progress, **kw):
        trained.append(seed)
        return {"seed_marker": seed}, 0.01

    def fake_health(params, hf, **kw):
        return {"deletion_drop": drops[params["seed_marker"]],
                "empty_rate": 0.0, "positive_fraction": 0.5,
                "cam_top5_mass": 0.3, "n_frames": 8}

    monkeypatch.setattr(tc, "train_critic", fake_train)
    monkeypatch.setattr(tc, "critic_cam_health", fake_health)
    frames = np.zeros((8, 64, 64, 3), np.uint8)
    labels = np.zeros(8, np.float32)

    # early stop: seed 1 hits 0.65 -> seed 2 never trains
    params, health, reports = tc.train_critic_selected(
        frames, labels, candidates=4, health_target=0.65, progress=False)
    assert trained == [0, 1]
    assert health["selected_seed"] == 1 and health["health_target_met"]
    assert len(reports) == 2

    # target never reached: argmax fallback, flagged
    trained.clear()
    params, health, _ = tc.train_critic_selected(
        frames, labels, candidates=4, health_target=0.95, progress=False)
    assert trained == [0, 1, 2, 3]
    assert health["selected_seed"] == 2
    assert health["health_target_met"] is False

    # no target: full pool, plain argmax, no flag key
    trained.clear()
    params, health, _ = tc.train_critic_selected(
        frames, labels, candidates=4, progress=False)
    assert trained == [0, 1, 2, 3]
    assert health["selected_seed"] == 2
    assert "health_target_met" not in health


def test_cam_health_no_positive_frames():
    """A critic that scores everything negative yields the defined
    degenerate-health values instead of NaN means over empty slices."""
    from critic_vae_tpu.train.critic import critic_cam_health

    params = init_critic_params(jax.random.key(0))
    # fresh-init critics output ~sigmoid(small); force decisively negative
    params["fc1_b"] = params["fc1_b"] - 10.0
    frames, _ = generate_frames(32, seed=0)
    h = critic_cam_health(params, frames, max_frames=32)
    assert h["positive_fraction"] == 0.0
    assert h["deletion_drop"] == 0.0
    assert h["empty_rate"] == 1.0
