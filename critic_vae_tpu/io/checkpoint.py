"""Native checkpointing: full training state, mid-run saves, resume.

The reference saves only final weights, encoder and decoder in separate
files, with no optimizer state and no resume (reference: vae.py:148-149,
162-163) — and its loader silently continues with random weights on failure
(vae_utility.py:353-357), a footgun deliberately not replicated: load errors
here raise.

Format: a single ``.npz`` with '/'-joined pytree paths — dependency-free,
host-portable, and layout-stable across JAX versions.
"""

from __future__ import annotations

import os
import tempfile
from typing import Any, Dict, Tuple

import jax
import numpy as np


def _is_prng_key(leaf: Any) -> bool:
    return isinstance(leaf, jax.Array) and jax.dtypes.issubdtype(leaf.dtype, jax.dtypes.prng_key)


def _flatten(tree: Any) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(
            str(getattr(p, "key", getattr(p, "idx", getattr(p, "name", p))))
            for p in path
        )
        if key in flat:
            raise ValueError(
                f"pytree flattens two distinct leaves to the same key {key!r} "
                "('/'-joined paths collide) — rename the offending fields"
            )
        if _is_prng_key(leaf):
            leaf = jax.random.key_data(leaf)  # typed PRNG key → raw uint32
        arr = np.asarray(leaf)
        if arr.dtype.hasobject or arr.dtype.kind == "V":
            # np.load would silently round-trip e.g. bfloat16 as a raw void
            # ('|V2') array — refuse loudly instead (cast to f32 first)
            raise TypeError(
                f"leaf {key!r} has dtype {arr.dtype}, which .npz cannot "
                "round-trip losslessly"
            )
        flat[key] = arr
    return flat


def save_pytree(path: str, tree: Any) -> None:
    """Atomically write a pytree of arrays to ``path`` (.npz).

    The zip is written directly (np.load-compatible) rather than via
    ``np.savez(f, **flat)``, whose kwargs would collide with its own
    ``file`` parameter for a leaf named "file".
    """
    import zipfile

    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    flat = _flatten(tree)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(os.path.abspath(path)), suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            with zipfile.ZipFile(f, "w", zipfile.ZIP_STORED) as zf:
                for key, arr in flat.items():
                    with zf.open(f"{key}.npy", "w") as entry:
                        np.lib.format.write_array(entry, arr)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_pytree(path: str, like: Any) -> Any:
    """Load arrays saved by :func:`save_pytree` into the structure of ``like``.

    Raises (never silently skips) on missing keys, shape mismatch, or
    stored arrays the ``like`` structure has no slot for — an extra key
    means the artifact was produced by a structurally different model
    (e.g. a FiLM-conditioned decoder loaded as a plain one) and dropping
    it would silently change behavior.
    """
    with np.load(path) as data:
        stored = dict(data)
    unused = set(stored)
    leaves_with_path, treedef = jax.tree_util.tree_flatten_with_path(like)
    new_leaves = []
    for path_entries, leaf in leaves_with_path:
        key = "/".join(
            str(getattr(p, "key", getattr(p, "idx", getattr(p, "name", p))))
            for p in path_entries
        )
        if key not in stored:
            raise KeyError(f"checkpoint {path} is missing leaf {key!r}")
        unused.discard(key)
        arr = stored[key]
        if _is_prng_key(leaf):
            new_leaves.append(
                jax.random.wrap_key_data(arr, impl=jax.random.key_impl(leaf))
            )
            continue
        expected = np.shape(leaf)
        if tuple(arr.shape) != tuple(expected):
            raise ValueError(
                f"checkpoint leaf {key!r} has shape {arr.shape}, expected {expected}"
            )
        expected_dtype = getattr(leaf, "dtype", None)
        if expected_dtype is not None and arr.dtype != expected_dtype:
            raise ValueError(
                f"checkpoint leaf {key!r} has dtype {arr.dtype}, "
                f"expected {expected_dtype}"
            )
        new_leaves.append(arr)
    if unused:
        raise ValueError(
            f"checkpoint {path} carries {len(unused)} leaves the target "
            f"structure has no slot for (e.g. {sorted(unused)[:3]}); loading "
            "would silently drop them — the artifact belongs to a "
            "structurally different model"
        )
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def save_train_state(path: str, state: Any) -> None:
    """Save a TrainState (params + BN stats + optimizer state + RNG + step)."""
    save_pytree(path, state)


def restore_train_state(path: str, like: Any) -> Any:
    return load_pytree(path, like)


def latest_checkpoint(directory: str, prefix: str = "ckpt-") -> Tuple[str, int] | None:
    """Find the newest ``{prefix}{step}.npz`` in a directory, or None."""
    if not os.path.isdir(directory):
        return None
    best = None
    for name in os.listdir(directory):
        if name.startswith(prefix) and name.endswith(".npz"):
            try:
                step = int(name[len(prefix) : -len(".npz")])
            except ValueError:
                continue
            if best is None or step > best[1]:
                best = (os.path.join(directory, name), step)
    return best


def prune_checkpoints(directory: str, keep: int, prefix: str = "ckpt-") -> None:
    if not os.path.isdir(directory):
        return
    entries = []
    for name in os.listdir(directory):
        if name.startswith(prefix) and name.endswith(".npz"):
            try:
                entries.append((int(name[len(prefix) : -len(".npz")]), name))
            except ValueError:
                continue
    for _, name in sorted(entries)[:-keep] if keep else []:
        os.unlink(os.path.join(directory, name))
