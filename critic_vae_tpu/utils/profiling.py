"""Profiling and timing helpers (greenfield — SURVEY §5: the reference has
no tracing of any kind beyond a time() log-dir suffix, vae.py:158)."""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import numpy as np


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]) -> Iterator[None]:
    """Capture a JAX/XLA profiler trace viewable in TensorBoard or Perfetto.

    No-op when ``log_dir`` is None, so call sites can take an optional
    ``--profile <dir>`` flag unconditionally.
    """
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed(label: str, sink=print) -> Iterator[None]:
    """Wall-clock a block; the sink receives ``f"{label}: {seconds:.3f}s"``."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        sink(f"{label}: {time.perf_counter() - t0:.3f}s")


def device_barrier(x) -> None:
    """True completion barrier: fetch a SMALL slice to host.

    On tunneled PJRT backends ``jax.block_until_ready`` proved unreliable as
    a barrier; the device queue is in-order, so materializing any output of
    the last program guarantees everything before it finished. Only the
    first element is fetched — passing a large output stays cheap.
    """
    arr = np.asarray(x.ravel()[:1] if hasattr(x, "ravel") else x)
    del arr
