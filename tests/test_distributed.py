"""Multi-host initialization smoke test (parallel/distributed.py).

Spawns two real processes with a local coordinator: validates
``jax.distributed.initialize`` wiring, process counting, primary election,
and one cross-process collective (allgather-sum). The reference is strictly
single-process (vae_parameters.py:2); this is greenfield SURVEY §2.3/§5
coverage.
"""

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = """
import sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
from critic_vae_tpu.parallel.distributed import init_distributed, is_primary
ok = init_distributed({addr!r}, num_processes=2, process_id=int(sys.argv[1]))
assert ok, "distributed mode not active"
assert jax.process_count() == 2
assert len(jax.devices()) == 2 * len(jax.local_devices())
import numpy as np
from jax.experimental import multihost_utils
g = multihost_utils.process_allgather(np.array([float(jax.process_index() + 1)]))
assert float(g.sum()) == 3.0, g
assert is_primary() == (int(sys.argv[1]) == 0)
# ONE atomic write: Gloo logs go straight to the fd and interleave between
# the multiple write() calls print(a, b) makes on an unbuffered stdout
sys.stdout.write(f"CHILD_OK {{jax.process_index()}}\\n")
sys.stdout.flush()
"""


def test_two_process_init_and_collective():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    child = _CHILD.format(repo=REPO, addr=f"127.0.0.1:{port}")
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", child, str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=240)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out[-2000:]}"
        assert f"CHILD_OK {i}" in out


def test_init_distributed_noops_without_environment():
    """Single-process runs must not be disturbed (no coordinator env set)."""
    from critic_vae_tpu.parallel.distributed import init_distributed

    for var in ("COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS",
                "MEGASCALE_COORDINATOR_ADDRESS"):
        assert var not in os.environ
    assert init_distributed() is False
