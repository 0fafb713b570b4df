"""Torch-free golden pins for the bundled pretrained critics.

The behavioral parity suite (test_reference_parity.py) runs the LIVE torch
reference — excellent while torch exists in the environment, invisible the
day it doesn't. These goldens freeze the reference behavior itself: the two
bundled critic checkpoints' tree-trunk probabilities (critic_net.py:66-69,
evaluation semantics of vae.py:82-88 — jpg ÷255, HWC→CHW, sigmoid head) on
all 68 bundled ``source-images/*.jpg``, recorded once WITH torch
(tests/golden/critic_source_image_probs.json) and asserted here through the
torch-free path: ``io/legacy_pt.py`` ingestion → layout transposition →
jitted ``critic_apply``. Any regression in the legacy-.pt reader, the
NCHW→HWIO weight conversion, or the critic's numerics shows up as a >1e-4
deviation with no torch required.
"""

import glob
import json
import os

import numpy as np
import pytest

from tests.conftest import REFERENCE, requires_reference

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "critic_source_image_probs.json")


@pytest.fixture(scope="module")
def goldens():
    with open(GOLDEN) as f:
        return json.load(f)


@requires_reference
def test_goldens_cover_both_checkpoints_and_all_images(goldens):
    ckpts = sorted(
        os.path.basename(p)
        for p in glob.glob(f"{REFERENCE}/saved-networks/critic-*.pt")
    )
    assert sorted(goldens) == ckpts and len(ckpts) == 2
    imgs = sorted(
        os.path.basename(p)
        for p in glob.glob(f"{REFERENCE}/source-images/*.jpg")
    )
    for ckpt, probs in goldens.items():
        assert sorted(probs) == imgs and len(imgs) == 68, ckpt


@requires_reference
def test_critic_probabilities_match_recorded_reference(goldens, source_images):
    import jax

    from critic_vae_tpu.models.critic import critic_apply, load_critic

    files = sorted(
        os.path.basename(p)
        for p in glob.glob(f"{REFERENCE}/source-images/*.jpg")
    )
    apply = jax.jit(critic_apply)
    for ckpt, probs in goldens.items():
        params = load_critic(f"{REFERENCE}/saved-networks/{ckpt}")
        ours = np.asarray(apply(params, source_images))[:, 0]
        recorded = np.asarray([probs[f] for f in files])
        np.testing.assert_allclose(ours, recorded, atol=1e-4, err_msg=ckpt)
