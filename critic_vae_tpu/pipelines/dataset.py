"""Recon-dataset construction + the second-VAE experiment.

Capability parity with the reference's ``-dataset`` / ``-second`` /
``-evalsecond`` modes (reference: vae.py:130-153, vae_utility.py:416-443):
build a dataset of VAE *reconstructions* — recon@pred for high-critic
frames, recon@0 for low, both for mid — then train a fresh VAE on it.

TPU-first: reconstructions are produced by batched double-decodes (the
reference runs two batch-1 evaluates per frame); the artifact is a
compressed ``.npz`` instead of a ~5 GB pickle (README.md:38). The
reference's own pickle artifacts still load (numpy-only restricted
unpickler), so existing ``-dataset`` outputs carry over.
"""

from __future__ import annotations

from typing import Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from critic_vae_tpu.data.sampler import balanced_critic_sampler
from critic_vae_tpu.models import vae as vae_mod


@jax.jit
def _recon_both(vae_params, bn_state, x, v):
    """Fused encode + doubled-batch double-decode — one program per chunk
    shape instead of ~40 eager remote dispatches (CLAUDE.md hazard)."""
    mu, _, _ = vae_mod.encode(vae_params, bn_state, x, train=False)
    b = mu.shape[0]
    both = vae_mod.decode(
        vae_params,
        jnp.concatenate([mu, mu], axis=0),
        jnp.concatenate([v, jnp.zeros((b,), v.dtype)]),
    )
    return both[:b], both[b:]


def make_recon_fn(vae_params, bn_state, batch_size: int = 512):
    """Batched (recon@pred, recon@0) producer for the sampler's recon mode.
    Ragged chunks are padded to one of two bucket shapes
    (data/sampler.py::pad_to_bucket) so a stream of arbitrary trajectory
    lengths compiles ≤2 program shapes — the round-3 version padded only
    when n > batch_size, recompiling per short-trajectory length
    (VERDICT r3 #4)."""
    from critic_vae_tpu.data.sampler import pad_to_bucket

    def recon_fn(frames: np.ndarray, preds: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        n = len(frames)
        outs_pred, outs_zero = [], []
        for i in range(0, n, batch_size):
            x, valid = pad_to_bucket(frames[i : i + batch_size], batch_size)
            v = np.asarray(preds[i : i + batch_size], np.float32)
            if len(v) < len(x):
                v = np.concatenate([v, np.repeat(v[-1:], len(x) - len(v))])
            rp, rz = _recon_both(
                vae_params, bn_state, jnp.asarray(x), jnp.asarray(v)
            )
            host = jax.device_get({"p": rp, "z": rz})
            outs_pred.append(host["p"][:valid])
            outs_zero.append(host["z"][:valid])
        return np.concatenate(outs_pred), np.concatenate(outs_zero)

    return recon_fn


def build_recon_dataset(
    trajectories: Iterable,
    critic_params,
    vae_params,
    bn_state,
    *,
    total_images: int = 50_000,
    collect: int = 150,
) -> np.ndarray:
    """(reference: load_minerl_data(recon_dset=True), vae_utility.py:422-443)."""
    return balanced_critic_sampler(
        trajectories,
        critic_params,
        total_images=total_images,
        collect=collect,
        recon_fn=make_recon_fn(vae_params, bn_state),
    )


def save_dataset(path: str, dataset: np.ndarray) -> None:
    np.savez_compressed(path, frames=dataset.astype(np.float32))


_ALLOWED_PICKLE_GLOBALS = {
    ("numpy.core.multiarray", "_reconstruct"),
    ("numpy.core.multiarray", "scalar"),
    ("numpy._core.multiarray", "_reconstruct"),  # numpy >= 2 module path
    ("numpy._core.multiarray", "scalar"),
    ("numpy", "ndarray"),
    ("numpy", "dtype"),
}


def _numpy_only_unpickler(file):
    """Restricted unpickler for the reference's recon-dataset pickles:
    only numpy array reconstruction globals resolve — anything else raises
    instead of executing arbitrary code (same stance as io/legacy_pt.py)."""
    import importlib
    import pickle

    class NumpyOnly(pickle.Unpickler):
        def find_class(self, module, name):
            if (module, name) in _ALLOWED_PICKLE_GLOBALS:
                return getattr(importlib.import_module(module), name)
            raise pickle.UnpicklingError(
                f"global {module}.{name} is forbidden in dataset pickles "
                "(only numpy arrays are expected)"
            )

    return NumpyOnly(file)


def load_dataset(path: str) -> np.ndarray:
    """Load a recon dataset: our ``.npz`` artifact, a raw ``.npy``
    (memory-mapped — zero-copy ingestion for huge arrays), or the
    reference's pickle format — a list of (1, 3, 64, 64) float32 BCHW
    arrays (reference: vae.py:135-136 pickles
    load_minerl_data(recon_dset=True)'s output; its train() then
    np.stack(...).squeeze()es it, vae.py:35). Either way returns
    (N, H, W, 3) float32 NHWC.

    Peak-memory hygiene for the reference-scale ~5 GB pickle (README.md:38,
    this 1-core host): the naive stack→transpose→astype chain holds THREE
    full copies at peak. Here the output is preallocated once and the
    unpickled list is consumed from the tail, freeing each source frame as
    it is converted — peak ≈ input + output, decaying to 1× (measured:
    tests/test_pipelines.py::test_load_dataset_pickle_peak_memory)."""
    import zipfile

    if path.endswith(".npy"):
        arr = np.load(path, mmap_mode="r")
        if arr.ndim != 4 or arr.shape[-1] != 3:
            raise ValueError(f".npy dataset must be (N, H, W, 3), got {arr.shape}")
        return arr
    if zipfile.is_zipfile(path):
        with np.load(path) as data:
            return data["frames"]
    with open(path, "rb") as f:
        dset = _numpy_only_unpickler(f).load()
    if not isinstance(dset, list) or not dset:
        raise ValueError(
            "unrecognized dataset pickle: expected a non-empty list of "
            "(1, 3, H, W) frames (reference vae_utility.py:422-443)"
        )
    first = np.squeeze(np.asarray(dset[0]))
    if first.ndim != 3 or first.shape[0] != 3:
        raise ValueError(
            f"unrecognized dataset pickle layout {first.shape}; expected a "
            "list of (1, 3, H, W) frames (reference vae_utility.py:422-443)"
        )
    c, h, w = first.shape
    out = np.empty((len(dset), h, w, c), np.float32)
    for i in range(len(dset) - 1, -1, -1):  # consume + free from the tail
        a = np.squeeze(np.asarray(dset.pop()))
        if a.shape != (c, h, w):
            raise ValueError(
                f"dataset pickle frame {i} has shape {a.shape}, expected {(c, h, w)}"
            )
        out[i] = a.transpose(1, 2, 0)
    return out
