"""Multi-host initialization (greenfield — SURVEY §2.3/§5).

The reference is strictly single-process (vae_parameters.py:2). For
multi-host TPU slices, JAX needs one ``jax.distributed.initialize`` per
process before any backend use; afterwards ``jax.devices()`` spans the whole
slice, a :func:`critic_vae_tpu.parallel.mesh.make_mesh` covers every chip,
and the same jitted train step scales — XLA routes the gradient all-reduce
over ICI within a slice and DCN across slices. No framework code changes.
"""

from __future__ import annotations

import os
from typing import Optional


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize multi-host JAX if a multi-process environment is detected.

    With no arguments, relies on JAX's cluster auto-detection (TPU pods set
    the environment automatically). Returns True if distributed mode is
    active. Safe to call in single-process runs — it no-ops.
    """
    import jax

    explicit = coordinator_address is not None
    auto = any(
        v in os.environ
        for v in ("COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS", "MEGASCALE_COORDINATOR_ADDRESS")
    )
    if not explicit and not auto:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_count() > 1


def is_primary() -> bool:
    """True on the process that should write checkpoints/logs."""
    import jax

    return jax.process_index() == 0
