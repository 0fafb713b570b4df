"""Device mesh + sharding helpers (greenfield TPU-native component).

The reference has no parallelism of any kind — single process, single device
(reference: vae_parameters.py:2; SURVEY §2.3). This module supplies the
TPU-native replacement: a 1-D ``jax.sharding.Mesh`` over all addressable
devices, with batches sharded along the ``data`` axis and parameters
replicated. Gradient reduction is *not* hand-written: jitted computation over
these shardings makes XLA insert the cross-replica all-reduce, which rides
ICI within a slice (and DCN across slices under ``jax.distributed``).

A 2.6M-param conv VAE has no use for tensor/pipeline/sequence parallelism
(SURVEY §2.3); the mesh abstraction here is deliberately N-D-ready (axis
names are parameters) so wider meshes compose if a larger model family is
dropped in.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(
    num_devices: int = 0,
    axis_names: Sequence[str] = (DATA_AXIS,),
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """Build a mesh over the addressable devices.

    Args:
      num_devices: devices to use; 0 = all. Must divide evenly into the
        requested mesh (1-D by default).
      axis_names: mesh axis names; default a single data axis.
    """
    devs = list(devices) if devices is not None else jax.devices()
    if num_devices:
        if len(devs) < num_devices:
            platform = devs[0].platform if devs else "none"
            raise ValueError(
                f"requested a {num_devices}-device mesh but only {len(devs)} "
                f"device(s) are available (platform={platform!r}). For a "
                f"virtual mesh on a small host, set XLA_FLAGS="
                f"--xla_force_host_platform_device_count={num_devices} and "
                f'force jax.config.update("jax_platforms", "cpu") before any '
                f"backend use (tests/conftest.py shows the recipe), or pass "
                f"explicit devices="
            )
        devs = devs[:num_devices]
    n = len(devs)
    if len(axis_names) == 1:
        shape: tuple = (n,)
    else:
        # fold all devices into the first axis by default
        shape = (n,) + (1,) * (len(axis_names) - 1)
    return Mesh(np.asarray(devs).reshape(shape), axis_names)


def batch_sharding(mesh: Mesh, ndim: int, axis: str = DATA_AXIS) -> NamedSharding:
    """Sharding that splits the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def shard_batch(mesh: Mesh, arr: Any, axis: str = DATA_AXIS) -> jax.Array:
    """Device-put a host batch sharded along the mesh's data axis."""
    arr = np.asarray(arr)
    return jax.device_put(arr, batch_sharding(mesh, arr.ndim, axis))


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Device-put a pytree fully replicated over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)
