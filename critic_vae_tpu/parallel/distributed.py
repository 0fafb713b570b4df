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

    Detection, in order:

    * explicit ``coordinator_address`` argument → initialize with it;
    * a coordinator env var (COORDINATOR_ADDRESS / JAX_COORDINATOR_ADDRESS /
      MEGASCALE_COORDINATOR_ADDRESS) → initialize, letting JAX read it;
    * ``CRITIC_VAE_TPU_DISTRIBUTED=1`` → call ``jax.distributed.initialize()``
      with no arguments so JAX's own cluster detection runs (GCE/GKE TPU-pod
      metadata, SLURM, Open MPI). Pod metadata detection lives INSIDE
      ``initialize`` — it cannot be sniffed from the environment here, so
      multi-host pod launchers must set this variable (or pass the
      coordinator explicitly); otherwise each host would silently train on
      its local chips only, with every process believing it is primary.

    Returns True if distributed mode is active. Safe to call in
    single-process runs — it no-ops (and an opt-in auto-detect that finds
    no cluster leaves JAX single-process).
    """
    import jax

    explicit = coordinator_address is not None
    env_coord = any(
        v in os.environ
        for v in ("COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS", "MEGASCALE_COORDINATOR_ADDRESS")
    )
    opt_in = os.environ.get("CRITIC_VAE_TPU_DISTRIBUTED") == "1"
    if not explicit and not env_coord and not opt_in:
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
