"""CRF backend selection policy (round 4, VERDICT r3 #7/#8).

Two backends implement the same dense-CRF mean-field semantics
(reference: vae_utility.py:22-54 wrapping denseCRF.densecrf):

* ``host`` — the C++ permutohedral-lattice approximation
  (crf/densecrf.cpp), O(N) per frame on CPU; the only option at large
  resolutions.
* ``device`` — the EXACT Gaussian mean-field on the accelerator
  (crf/device.py), O(N²) in pixels via MXU matmuls; measured ~6× the host
  lattice at the pipeline's native 64² and the only backend with the
  lane-packed 13-threshold sweep refinement (~9× a sequential sweep).

The exact device formulation materializes the N×N pairwise structure, so
its memory is quadratic in pixel count: at 64² the Gram work fits
comfortably, at 128² it is feasible-but-heavy (a bf16 N×N matrix is
537 MB), and at 256² one frame's matrix is ~8.6 GB — runnable on a 16 GB
chip only at ``frame_chunk=1`` with nothing else resident. The resolver
below encodes the measured crossover ({64², 128², 256²} tables in
docs/DESIGN.md "CRF backend crossover" round 4 + "Round 5", artifacts
crf_crossover.json / crf_256.json).
"""

from __future__ import annotations

# Largest pixel count ``auto`` hands to the exact device mean-field:
# 128² ⇒ the per-frame N×N bf16 matrix is 537 MB, which the chunked builds
# handle and the measured margin still favors (1.9× the host lattice,
# docs/artifacts/crf_crossover.json).
DEVICE_MAX_PIXELS = 128 * 128

# Largest pixel count an EXPLICIT ``--crf-backend device`` request accepts.
# Round 5 measured the Pallas-streamed build at 256² on the real chip:
# 168.5 ms/frame, 1.61× the host lattice, mask agreement 1.0
# (docs/artifacts/crf_256.json) — legal, but auto stays on host there: the
# win is marginal while the run monopolizes HBM (8.6 GB/frame at
# frame_chunk=1, crf/device.py's memory clamp) and cold-compiles for
# ~2.4 min. Past 256² the matrix alone exceeds the chip (512² ⇒ 137 GB).
DEVICE_HARD_MAX_PIXELS = 256 * 256


def resolve_crf_backend(
    requested: str,
    h: int,
    w: int,
    *,
    backend_platform: str | None = None,
    process_count: int | None = None,
) -> str:
    """Resolve a ``--crf-backend`` request ('auto'|'host'|'device').

    ``auto`` picks ``device`` when (a) an accelerator backend is live,
    (b) the run is single-process (the device sweep path keeps masks
    device-resident, which multi-host cannot), and (c) the resolution is
    within the exact formulation's quadratic-memory budget
    (≤ ``DEVICE_MAX_PIXELS``); otherwise ``host``. This puts the
    lane-packed device sweep on the DEFAULT path — through round 3 a plain
    ``video --sweep`` ran 13 sequential host-lattice CRFs unless the user
    knew to pass ``--crf-backend device`` (VERDICT r3 #7).

    An explicit ``device`` request is honored up to
    ``DEVICE_HARD_MAX_PIXELS`` (256² — measured legal and 1.61× the host
    lattice, round 5) and raises loudly past that (VERDICT r3 #8) instead
    of letting the chip OOM minutes into a compile.
    """
    if requested not in ("auto", "host", "device"):
        raise ValueError(
            f"unknown crf backend {requested!r} (auto|host|device)"
        )
    npix = int(h) * int(w)
    if requested == "device":
        if npix > DEVICE_HARD_MAX_PIXELS:
            raise ValueError(
                f"crf backend 'device' is the EXACT O(N²) mean-field; at "
                f"{h}x{w} its per-frame pairwise matrix alone is "
                f"~{2 * npix * npix / 1e9:.1f} GB — use --crf-backend host "
                f"(the permutohedral lattice exists precisely for large N, "
                f"reference vae_utility.py:22-54)"
            )
        return "device"
    if requested == "host":
        return "host"
    # auto
    if backend_platform is None:
        import jax

        backend_platform = jax.default_backend()
    if process_count is None:
        import jax

        process_count = jax.process_count()
    if (
        backend_platform != "cpu"
        and process_count == 1
        and npix <= DEVICE_MAX_PIXELS
    ):
        return "device"
    return "host"
