"""Test configuration: run everything on a virtual 8-device CPU mesh.

The reference has no tests at all (SURVEY §4); this suite is designed from
scratch. Multi-device behavior is exercised with the standard JAX trick of
forcing 8 virtual host-platform devices, so data-parallel train-step
equivalence is tested without TPU hardware.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

# The container's sitecustomize registers the axon TPU backend at interpreter
# start; override to CPU before any backend is initialized.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE = "/root/reference"
CRITIC_PT = (
    f"{REFERENCE}/saved-networks/critic-rewidx=1-cepochs=15-datamode=trunk-"
    "datasize=99999-shift=12-chfak=1-dropout=0.3.pt"
)
CRITIC_PT_2 = (
    f"{REFERENCE}/saved-networks/critic-rewidx=1-cepochs=15-datamode=trunk-"
    "datasize=100000-shift=12-chfak=1-dropout=0.3.pt"
)

requires_reference = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference checkout not mounted"
)


def has_torch() -> bool:
    try:
        import torch  # noqa: F401

        return True
    except ImportError:
        return False


requires_torch = pytest.mark.skipif(not has_torch(), reason="torch unavailable")

# The unit-level tier: `pytest -m quick` (~4 min on this 1-core host vs
# ~15-20 for the full suite — VERDICT r4 weak #5). Files whose tests are
# pure ops/model/IO units; everything pipeline-, CLI-, training- or
# multi-process-shaped stays full-suite-only.
QUICK_FILES = {
    "test_critic.py", "test_iou.py", "test_legacy_pt.py", "test_mask.py",
    "test_msssim.py", "test_sampler.py", "test_upconv.py", "test_utils.py",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "quick: unit-level tier (`pytest -m quick`), ~4 min"
    )


def pytest_collection_modifyitems(config, items):
    for item in items:
        if os.path.basename(str(item.fspath)) in QUICK_FILES:
            item.add_marker(pytest.mark.quick)


@pytest.fixture(scope="session")
def critic_params():
    from critic_vae_tpu.models.critic import load_critic

    return load_critic(CRITIC_PT)


@pytest.fixture(scope="session")
def source_images():
    """The 68 bundled eval frames as one (N, 64, 64, 3) float batch."""
    import glob

    from PIL import Image

    files = sorted(glob.glob(f"{REFERENCE}/source-images/*.jpg"))
    return np.stack(
        [np.asarray(Image.open(f), dtype=np.float32) / 255.0 for f in files]
    )


@pytest.fixture(scope="session")
def synthetic_episode(tmp_path_factory):
    """A tiny synthetic minerl-episode (X.npy/Y.npy format) for pipeline tests."""
    from critic_vae_tpu.data.synthetic import generate_episode

    root = tmp_path_factory.mktemp("episode")
    generate_episode(str(root), num_frames=40, seed=0)
    return str(root)
