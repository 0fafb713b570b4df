"""Driver-contract coverage for ``__graft_entry__``.

Round 1 failed the driver's multi-chip dryrun because ``dryrun_multichip``
relied on the caller to provision the virtual CPU platform (MULTICHIP_r01:
``make_mesh(8)`` built a size-1 mesh under the container's single-chip axon
backend). These tests pin the fix: the entry point self-provisions, and
``make_mesh`` refuses to under-build silently.
"""

import os
import subprocess
import sys

import jax
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __graft_entry__  # noqa: E402


def test_entry_jits_and_runs():
    fn, args = __graft_entry__.entry()
    loss = jax.jit(fn)(*args)
    assert float(loss) > 0


def test_dryrun_multichip_in_process():
    # conftest already provisions 8 virtual CPU devices; the dryrun must
    # pass without touching any other backend.
    __graft_entry__.dryrun_multichip(8)


def test_dryrun_multichip_4_devices():
    __graft_entry__.dryrun_multichip(4)


def test_make_mesh_raises_on_insufficient_devices():
    from critic_vae_tpu.parallel.mesh import make_mesh

    with pytest.raises(ValueError, match="xla_force_host_platform_device_count"):
        make_mesh(len(jax.devices()) + 1)


def test_dryrun_multichip_driver_simulation():
    """Exactly the driver's situation: a FRESH interpreter with no conftest,
    where the container's sitecustomize makes a single-chip TPU (or plain
    1-device CPU) the default platform, calls dryrun_multichip(8)."""
    env = dict(os.environ)
    # strip any help the test harness injected
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "force_host_platform_device_count" not in f
    )
    code = (
        f"import sys; sys.path.insert(0, {REPO!r}); "
        # keep the simulation off the real tunneled TPU: the point here is
        # the self-provisioning logic, not backend reachability
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "import __graft_entry__; __graft_entry__.dryrun_multichip(8); "
        "print('DRYRUN_OK')"
    )
    res = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True, text=True,
        timeout=600,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "DRYRUN_OK" in res.stdout
