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
import jax.numpy as jnp
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


def device_put_global(mesh: Mesh, tree: Any, spec: P = P()) -> Any:
    """Device-put a pytree onto the mesh with one PartitionSpec — working in
    multi-process (multi-host) programs too.

    In a multi-host run every process calls this with the SAME host values
    (the framework's data/replication convention — each process computes the
    identical dataset/params from the shared seed); ``jax.device_put`` then
    fills each process's addressable shards from its local copy. Two leaf
    quirks handled here:

    * typed PRNG keys: ``device_put`` refuses extended dtypes on shardings
      with non-addressable devices, so keys ride as raw ``key_data`` and are
      re-wrapped;
    * committed local ``jax.Array`` leaves (e.g. fresh params on the default
      device) are pulled to host first when the mesh spans processes.
    """
    sharding = NamedSharding(mesh, spec)
    multi = jax.process_count() > 1

    def put(x):
        if hasattr(x, "dtype") and jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key):
            impl = jax.random.key_impl(x)
            kd = np.asarray(jax.random.key_data(x))
            return jax.random.wrap_key_data(jax.device_put(kd, sharding), impl=impl)
        if multi and isinstance(x, jax.Array):
            x = np.asarray(x)
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, tree)


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Device-put a pytree fully replicated over the mesh."""
    return device_put_global(mesh, tree, P())


def fetch(tree: Any) -> Any:
    """Bring device arrays to host — ``jax.device_get`` plus the multi-host
    case: a sharded global array is not fully addressable on any one process,
    so it is gathered with ``multihost_utils.process_allgather`` (every
    process receives the full value; fully-replicated arrays are read
    locally with no communication)."""
    if jax.process_count() == 1:
        return jax.device_get(tree)
    from jax.experimental import multihost_utils

    def one(x):
        if not isinstance(x, jax.Array):
            return np.asarray(x)
        if jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key):
            if x.is_fully_addressable:
                return jax.device_get(x)
            # typed keys have no numpy representation; round-trip the raw
            # key_data and re-wrap as a host-local key
            impl = jax.random.key_impl(x)
            kd = one(jax.random.key_data(x))
            return jax.random.wrap_key_data(jnp.asarray(kd), impl=impl)
        if not x.is_fully_addressable and not x.is_fully_replicated:
            return multihost_utils.process_allgather(x, tiled=True)
        return np.asarray(x)

    return jax.tree_util.tree_map(one, tree)
