"""Mosaic capability probe for the fused front-end kernel design (round 4).

The last serving-perf lever DESIGN.md names is a Mosaic kernel computing
the merged front-end conv (s2d 3×3 GEMM formulation, examples/s2d_probe.py)
with the 2×2 max-pool fused into the matmul epilogue, so the (B,64,64,40)
intermediate never exists in HBM. That design hinges on three Mosaic
operations CLAUDE.md's round-3 notes flagged as potentially unsupported:

  Q1  writing a 12-lane block into a 128-lane VMEM scratch at lane offset
      12*t (the in-VMEM im2col build for the 6*6*3=108-lane patch rows)
  Q2  reading 40-lane slices at lane offsets 40*p and maxing them (the
      4-phase-group pool max over the 160 phase channels)
  Q3  a per-frame fori_loop with dynamic row slices feeding an MXU
      dot_general accumulate (streaming frames through a VMEM scratch)

Each question is posed as a minimal pallas_call checked against numpy.
Artifact: docs/artifacts/mosaic_caps.json — all three TRUE on the real
chip (2026-08-19), so the kernel is feasible; what bounds its value is
the pool stage's measured share of block time (see DESIGN "Round 4").

Run: PYTHONPATH=/root/repo:/root/.axon_site python examples/mosaic_caps_probe.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(out_path="/tmp/mosaic_caps.json"):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    cache = os.path.expanduser("~/.cache/critic_vae_tpu/jax")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    res = {"platform": jax.default_backend()}

    # Q1: lane-offset writes (im2col build)
    def k1(x_ref, o_ref):
        o_ref[...] = jnp.zeros_like(o_ref)
        for t in range(9):
            o_ref[:, 12 * t : 12 * (t + 1)] = x_ref[:, t : t + 12]

    try:
        x = jnp.arange(128 * 20, dtype=jnp.float32).reshape(128, 20)
        out = pl.pallas_call(
            k1, out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
        )(x)
        exp = np.zeros((128, 128), np.float32)
        xn = np.asarray(x)
        for t in range(9):
            exp[:, 12 * t : 12 * (t + 1)] = xn[:, t : t + 12]
        res["q1_lane_offset_write"] = bool(np.allclose(np.asarray(out), exp))
    except Exception as e:  # noqa: BLE001
        res["q1_lane_offset_write"] = f"FAIL {type(e).__name__}: {str(e)[:200]}"
    print("Q1 lane-offset write:", res["q1_lane_offset_write"], flush=True)

    # Q2: sub-128 lane reads at offsets 40p + elementwise max (phase pool)
    def k2(x_ref, o_ref):
        m = x_ref[:, 0:40]
        for p in range(1, 4):
            m = jnp.maximum(m, x_ref[:, 40 * p : 40 * (p + 1)])
        o_ref[...] = m

    try:
        x = jnp.asarray(np.random.default_rng(0).random((128, 160)), jnp.float32)
        out = pl.pallas_call(
            k2, out_shape=jax.ShapeDtypeStruct((128, 40), jnp.float32),
        )(x)
        exp = np.asarray(x).reshape(128, 4, 40).max(axis=1)
        res["q2_phase_max_40"] = bool(np.allclose(np.asarray(out), exp))
    except Exception as e:  # noqa: BLE001
        res["q2_phase_max_40"] = f"FAIL {type(e).__name__}: {str(e)[:200]}"
    print("Q2 40-lane phase max:", res["q2_phase_max_40"], flush=True)

    # Q3: fori_loop + dynamic row slices + dot accumulate (bf16 MXU)
    def k3(x_ref, w_ref, o_ref):
        def body(f, carry):
            m = x_ref[pl.ds(f * 64, 32), :]
            o_ref[pl.ds(f * 32, 32), :] = jax.lax.dot_general(
                m, w_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return carry

        jax.lax.fori_loop(0, 4, body, 0)

    try:
        x = jnp.asarray(np.random.default_rng(1).random((256, 128)), jnp.bfloat16)
        w = jnp.asarray(np.random.default_rng(2).random((128, 160)), jnp.bfloat16)
        out = pl.pallas_call(
            k3, out_shape=jax.ShapeDtypeStruct((128, 160), jnp.float32),
        )(x, w)
        xn = np.asarray(x, np.float32)
        wn = np.asarray(w, np.float32)
        exp = np.concatenate([xn[f * 64 : f * 64 + 32] @ wn for f in range(4)])
        res["q3_fori_dyn_dot"] = bool(
            np.allclose(np.asarray(out), exp, atol=0.5, rtol=0.05))
    except Exception as e:  # noqa: BLE001
        res["q3_fori_dyn_dot"] = f"FAIL {type(e).__name__}: {str(e)[:200]}"
    print("Q3 fori+dyn-slice+dot:", res["q3_fori_dyn_dot"], flush=True)

    with open(out_path, "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res))


if __name__ == "__main__":
    main(*sys.argv[1:])
