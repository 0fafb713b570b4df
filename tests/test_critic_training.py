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
