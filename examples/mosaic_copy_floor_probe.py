"""VPU copy-floor measurement for the fused front-end kernel (round 4).

The capability probe (examples/mosaic_caps_probe.py) showed the fused
conv+pool kernel's building blocks all work; what decides its viability
is the cost of the in-VMEM im2col build — 9 lane-offset copies of a
(32, 12) block per (frame, output-row), i.e. 294,912 such copies per
batch-1024 dispatch (B·32 rows · 9 taps). This probe measures that copy
floor directly: a kernel whose per-iteration body is exactly the im2col
build (36 dynamic-row-slice reads → lane-offset scratch writes for a
4-frame group) plus the (128,128)@(128,160) MXU dot, against the same
kernel with the copies removed (dot only, pre-staged scratch). The
difference is the pure VPU copy cost the fused design would pay.

Verdict feeds DESIGN.md "The fused front-end kernel: measured dead end".
Measured 2026-08-19 (artifact docs/artifacts/mosaic_copy_floor.json):
dot-only floor at F=4 is 5.52 ms vs the 1.33 ms XLA front-end (conv
1.22 + pool 0.11) — per-dot overhead at the im2col-forced M=32/frame
granularity kills the design before a single copy is paid; the
copy-laden variant AND the F=16 dot-only variant both crash the remote
Mosaic compiler (HTTP 500 tpu_compile_helper). PROBE_F sets frames per
program.

Run: PYTHONPATH=/root/repo:/root/.axon_site python examples/mosaic_copy_floor_probe.py
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(out_path="/tmp/mosaic_copy_floor.json"):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    cache = os.path.expanduser("~/.cache/critic_vae_tpu/jax")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    B = 1024                     # frames per batch
    F = int(os.environ.get("PROBE_F", 4))  # frames per program (M = 32·F)
    ROWS = 34 * 34               # s2d scanline-pixel rows per frame
    OUT_ROWS = 32 * 32           # pooled pixels per frame

    def kernel(x_ref, w_ref, o_ref, scratch, *, do_copies):
        # scratch (32·F, 128) bf16: lanes 108..128 stay zero (weight rows
        # there are zero too, so garbage would also be harmless — zeroing
        # once keeps NaN·0 out of the question)
        scratch[...] = jnp.zeros_like(scratch)

        def body(i, carry):
            if do_copies:
                for f in range(F):
                    for r in range(3):
                        for t in range(3):
                            scratch[
                                pl.ds(32 * f, 32),
                                36 * r + 12 * t : 36 * r + 12 * t + 12,
                            ] = x_ref[
                                pl.ds(ROWS * f + 34 * (i + r) + t, 32), :
                            ]
            acc = jax.lax.dot_general(
                scratch[...], w_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m = acc[:, 0:40]
            for p in range(1, 4):
                m = jnp.maximum(m, acc[:, 40 * p : 40 * (p + 1)])
            m = jnp.maximum(m, 0.0).astype(jnp.bfloat16)
            for f in range(F):
                o_ref[pl.ds(OUT_ROWS * f + 32 * i, 32), :] = (
                    m[32 * f : 32 * f + 32, :]
                )
            return carry

        jax.lax.fori_loop(0, 32, body, 0)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((B * ROWS, 12)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(0, 0.1, (128, 160)), jnp.bfloat16)

    def make(do_copies):
        call = pl.pallas_call(
            functools.partial(kernel, do_copies=do_copies),
            grid=(B // F,),
            in_specs=[
                pl.BlockSpec((F * ROWS, 12), lambda g: (g, 0)),
                pl.BlockSpec((128, 160), lambda g: (0, 0)),
            ],
            out_specs=pl.BlockSpec((F * OUT_ROWS, 40), lambda g: (g, 0)),
            out_shape=jax.ShapeDtypeStruct((B * OUT_ROWS, 40), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((32 * F, 128), jnp.bfloat16)],
        )
        # sum-reduced output as the timing barrier (repo methodology:
        # large-output fetches through the ~13 MB/s tunnel pollute timings)
        return jax.jit(lambda xb, wb: jnp.sum(
            call(xb, wb).astype(jnp.float32)))

    res = {"platform": jax.default_backend(), "copies_per_batch": B * 32 * 9}

    def timeit(fn, *args, reps=5, iters=10):
        np.asarray(jax.device_get(fn(*args)))
        meds = []
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(iters):
                r = fn(*args)
            np.asarray(jax.device_get(r))
            meds.append((time.perf_counter() - t0) / iters)
        return float(np.median(meds) * 1e3)

    for name, do_copies in (("dot_only", False), ("copies_and_dot", True)):
        try:
            fn = make(do_copies)
            res[f"{name}_ms"] = round(timeit(fn, x, w), 3)
        except Exception as e:  # noqa: BLE001
            res[f"{name}_ms"] = f"FAIL {type(e).__name__}: {str(e)[:300]}"
        print(name, res[f"{name}_ms"], flush=True)

    if all(isinstance(res[k], float) for k in ("dot_only_ms", "copies_and_dot_ms")):
        res["copy_floor_ms"] = round(
            res["copies_and_dot_ms"] - res["dot_only_ms"], 3)
        res["ns_per_copy"] = round(
            1e6 * res["copy_floor_ms"] / res["copies_per_batch"], 1)

    with open(out_path, "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    main(*sys.argv[1:])
