"""Utils + recon_samples + distributed-helper tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from critic_vae_tpu.models import vae as vae_mod
from critic_vae_tpu.utils.image import adjust_values, reverse_preprocess
from critic_vae_tpu.utils.profiling import device_barrier, profile_trace, timed


def test_adjust_values_roundtrip():
    img = np.arange(12, dtype=np.uint8).reshape(2, 2, 3) * 20
    f = adjust_values(img)
    assert f.dtype == np.float32 and f.max() <= 1.0
    back = reverse_preprocess(f)
    np.testing.assert_array_equal(back, img)


def test_recon_samples():
    params, state = vae_mod.init_vae_params(jax.random.key(0))
    x = jax.random.uniform(jax.random.key(1), (2, 64, 64, 3))
    out = vae_mod.recon_samples(
        params, state, jax.random.key(2), x, jnp.asarray(0.5), n_samples=6
    )
    assert out.shape == (2, 6, 64, 64, 3)
    # stochastic: different samples of the same frame must differ
    assert float(jnp.abs(out[0, 0] - out[0, 1]).max()) > 1e-6


def test_profile_trace_noop_and_capture(tmp_path):
    with profile_trace(None):
        pass  # no-op path
    d = str(tmp_path / "trace")
    with profile_trace(d):
        jax.block_until_ready(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    # a plugins/profile dir with at least one capture must exist
    found = []
    for root, _dirs, files in os.walk(d):
        found.extend(files)
    assert found, "profiler trace wrote no files"


def test_timed_and_barrier(capsys):
    msgs = []
    with timed("block", sink=msgs.append):
        device_barrier(jnp.arange(4.0) * 2)
    assert len(msgs) == 1 and msgs[0].startswith("block:")


def test_init_distributed_noop_single_process(monkeypatch):
    from critic_vae_tpu.parallel.distributed import init_distributed, is_primary

    for v in ("COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS", "MEGASCALE_COORDINATOR_ADDRESS"):
        monkeypatch.delenv(v, raising=False)
    assert init_distributed() is False
    assert is_primary() is True
