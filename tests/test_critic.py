"""Critic CNN parity and behavior tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from critic_vae_tpu.models.critic import critic_apply
from tests.conftest import CRITIC_PT, requires_reference, requires_torch


@requires_reference
def test_output_shape_and_range(critic_params, source_images):
    preds = np.asarray(critic_apply(critic_params, jnp.asarray(source_images)))
    assert preds.shape == (len(source_images), 1)
    assert np.all((preds > 0) & (preds < 1))
    # the bundled frames include both treed and treeless views: the frozen
    # critic should spread predictions across both ends
    assert preds.max() > 0.6 and preds.min() < 0.3


@requires_reference
@requires_torch
def test_parity_vs_torch(critic_params, source_images):
    import sys

    import torch

    sys.path.insert(0, "/root/reference")
    from critic_net import Critic

    c = Critic()
    c.load_state_dict(torch.load(CRITIC_PT, weights_only=True))
    c.eval()
    with torch.no_grad():
        ref = c(torch.from_numpy(source_images.transpose(0, 3, 1, 2))).numpy()
    with jax.default_matmul_precision("highest"):
        ours = np.asarray(critic_apply(critic_params, jnp.asarray(source_images)))
    np.testing.assert_allclose(ours, ref, atol=2e-5)


@requires_reference
def test_batched_equals_per_frame(critic_params, source_images):
    """Batched inference (our design) must match the reference's batch-1 loop
    semantics (vae.py:85-88) frame for frame."""
    batch = jnp.asarray(source_images[:8])
    with jax.default_matmul_precision("highest"):
        full = np.asarray(critic_apply(critic_params, batch))
        single = np.concatenate(
            [np.asarray(critic_apply(critic_params, batch[i : i + 1])) for i in range(8)]
        )
    np.testing.assert_allclose(full, single, atol=1e-6)


@requires_reference
def test_collect_feature_maps(critic_params, source_images):
    """The collect=True tap returns the five post-pool/post-conv activations
    (reference: critic_net.py:49-52)."""
    x = jnp.asarray(source_images[:2])
    preds, embeds = critic_apply(critic_params, x, collect=True)
    assert preds.shape == (2, 1)
    shapes = [e.shape for e in embeds]
    assert shapes == [
        (2, 32, 32, 8),
        (2, 16, 16, 8),
        (2, 8, 8, 8),
        (2, 4, 4, 16),
        (2, 1, 1, 32),
    ]


@requires_reference
def test_tap_offset_hook_is_inert_and_composes_with_collect(
        critic_params, source_images):
    """The CAM hook (tap_offset): a zeros offset must not change preds or
    embeds, the returned tap must equal the matching collect embed, and a
    nonzero offset must flow through to the prediction."""
    x = jnp.asarray(source_images[:2])
    base_preds, base_embeds = critic_apply(critic_params, x, collect=True)
    zeros = jnp.zeros((2, 16, 16, 8))
    preds, embeds, tap = critic_apply(
        critic_params, x, collect=True, tap_offset=(1, zeros))
    np.testing.assert_allclose(np.asarray(preds), np.asarray(base_preds),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(tap), np.asarray(base_embeds[1]),
                               atol=1e-6)
    for got, want in zip(embeds, base_embeds):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-6)
    bumped = critic_apply(critic_params, x, tap_offset=(1, zeros + 0.5))
    preds2, tap2 = bumped
    assert not np.allclose(np.asarray(preds2), np.asarray(base_preds))
    np.testing.assert_allclose(np.asarray(tap2),
                               np.asarray(base_embeds[1]) + 0.5, atol=1e-6)


@requires_reference
def test_jit_compiles_once(critic_params):
    traces = 0

    def fn(x):
        nonlocal traces
        traces += 1
        return critic_apply(critic_params, x)

    jfn = jax.jit(fn)
    x = jnp.zeros((4, 64, 64, 3))
    jfn(x)
    jfn(x + 1)
    assert traces == 1


@requires_reference
def test_rejects_missing_keys():
    from critic_vae_tpu.models.critic import critic_params_from_torch

    with pytest.raises(KeyError):
        critic_params_from_torch({"features.0.weight": np.zeros((8, 3, 3, 3))})
