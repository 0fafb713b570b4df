"""Exact dense-CRF mean-field on the TPU.

TPU-native alternative to the host C++ permutohedral CRF (``crf/densecrf.cpp``),
replacing the reference's external ``denseCRF`` dependency
(reference: vae_utility.py:12,39 with the fixed parameter tuple at
vae_utility.py:25-30) on the accelerator itself.

The permutohedral lattice exists because a fully-connected Gaussian CRF is
too expensive to evaluate exactly on a CPU.  On a TPU at this problem size
the economics invert: a 64x64 frame has N = 4096 pixels, so the full N x N
pairwise kernel is a 4096 x 4096 matrix and one mean-field update is a
single MXU matmul ``M @ Q`` (~67 MFLOP).  We therefore compute the EXACT
model the lattice only approximates:

    K_b[i,j] = exp(-1/2 ||(x,y)/alpha - .||^2 - 1/2 ||rgb/beta - .||^2),  i != j
    K_s[i,j] = exp(-1/2 ||(x,y)/gamma - .||^2),                           i != j
    n_k      = 1/sqrt(K_k @ 1 + 1e-20)          (symmetric normalization)
    M_b      = w1 * (n_b n_b^T) . K_b
    Q <- softmax(-U + M_b @ Q + w2 * n_s . (K_s @ (n_s . Q)))   x iters
    seg = argmax Q

with the same unary (-log(clamp(prob, 1e-8))), Q0 (normalized prob) and
Potts compatibility (via the softmax shift-invariance) as the C++ path.

One deliberate deviation from the lattice path's literal arithmetic: the
message passing here runs over j != i — the CRF model's actual definition
(pairwise energies are defined on pixel PAIRS).  The lattice includes the
self term, but its splatting diffuses the delta across simplex vertices so
the effective self-coupling is small and harmless.  Reproducing the
self-term exactly (K_ii = 1) is a measured pathology: with the reference's
narrow color bandwidth (beta = 3.1) a pixel in a textured region has almost
no feature-space neighbors, its rowsum is ~1, and the normalized
self-message approaches w1 * q_i = 22 * q_i — mean-field locks every noise
speckle to its initial label (measured: whole-stack IoU 0.70 with the self
term vs 0.995 without, lattice backend 0.939, on the synthetic-episode
corpus).  Excluding the diagonal is both the correct model and the better
segmenter; segmentation agreement with the lattice backend is >99.7%.

Only the bilateral kernel needs the N^2 matrix.  The spatial kernel
exp(-(dx^2+dy^2)/2 gamma^2) is EXACTLY separable, so its message is a
truncated separable Gaussian depthwise conv (taps span >= 8 gamma, where
the Gaussian is < 1e-13 — exact at f32) — O(N*K) instead of O(N^2), no
frame-shared matrix to build at all.  Frames are processed in fixed-size
padded chunks so jit compiles once; the per-frame bilateral ``M`` is the
only N^2 temporary (67 MB fp32 / 33 MB bf16 per frame in the chunk).
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from critic_vae_tpu.crf import DEFAULT_PARAM_GRID, REFERENCE_CRF_PARAMS
from critic_vae_tpu.ops.iou import iou as iou_metric

_EPS_PROB = 1e-8  # matches densecrf.cpp unary clamp
_EPS_NORM = 1e-20  # matches densecrf.cpp norm epsilon


def _coords(h: int, w: int, dtype=jnp.float32) -> jnp.ndarray:
    """(N, 2) pixel coordinates in (x, y) order — matching the C++ feature
    layout (densecrf.cpp build order: x first, then y)."""
    y, x = jnp.meshgrid(jnp.arange(h, dtype=dtype), jnp.arange(w, dtype=dtype),
                        indexing="ij")
    return jnp.stack([x.reshape(-1), y.reshape(-1)], axis=-1)


def _half_sqdist(feats: jnp.ndarray) -> jnp.ndarray:
    """-1/2 ||f_i - f_j||^2 via one Gram matmul, clamped to <= 0 (float
    error can push near-equal pairs slightly positive); exactly 0 at i = j
    (the subtraction cancels bit-for-bit).

    Precision.HIGHEST is load-bearing: the TPU MXU's default precision
    rounds f32 operands to bf16 (~0.4% relative), which at these feature
    magnitudes (squared color norms reach ~2e4) would corrupt logk by up
    to ±80 AND break the exact diagonal cancellation the predicate in
    _normalized_kernel relies on. The gram is a skinny (N, d<=3) matmul —
    full precision costs well under a millisecond per frame."""
    sq = jnp.sum(feats * feats, axis=-1)
    gram = jnp.matmul(feats, feats.T, precision=jax.lax.Precision.HIGHEST)
    return jnp.minimum(gram - 0.5 * (sq[:, None] + sq[None, :]), 0.0)


def _normalized_kernel(pos: jnp.ndarray, extra, weight, dtype,
                       diag_margin=0.0) -> jnp.ndarray:
    """weight * (n n^T) ⊙ K for j != i, with n = 1/sqrt(K@1 + eps);
    features are the concatenation of ``pos`` (scaled pixel coordinates)
    and optional ``extra`` (scaled colors).

    The diagonal is excluded by the data-dependent predicate
    ``logk_pos < -diag_margin``: distinct pixels ALWAYS differ in position,
    so their positional half-distance is at most -(1px/scale)²/2, while at
    i = j it is ~0 up to float noise. ``diag_margin`` must sit strictly
    between those (callers pass (1px/scale)²/4). A bare ``< 0`` predicate is
    NOT safe: the Gram's matmul and the ‖f‖² row sums can accumulate in
    different orders, and XLA:CPU was measured producing logp[i,i] = -2.4e-7
    — which leaked the k_ii = 1 self-term and inflated that row's
    normalizer by the very pathology the module docstring describes (5.8×
    error on one M row on the 16×16 synthetic corpus). An explicit
    iota != mask would be an N×N compile-time constant that XLA folds into
    a 16.7 MB literal at 64×64 (multi-minute compiles); ``rowsum - 1``
    would catastrophically cancel the tiny off-diagonal rowsums of isolated
    pixels. The margin predicate avoids all three."""
    logp = _half_sqdist(pos)
    logk = logp if extra is None else logp + _half_sqdist(extra)
    k = jnp.where(logp < -diag_margin, jnp.exp(logk), 0.0)
    n = jax.lax.rsqrt(jnp.sum(k, axis=-1) + _EPS_NORM)
    return (weight * (n[:, None] * n[None, :]) * k).astype(dtype)


def _sep_conv(x: jnp.ndarray, taps: jnp.ndarray) -> jnp.ndarray:
    """Separable depthwise 2-D convolution: (H, W, C) ⊛ outer(taps, taps)."""
    c = x.shape[-1]
    k = taps.shape[0]
    dn = ("NHWC", "HWIO", "NHWC")
    out = jax.lax.conv_general_dilated(
        x[None], jnp.tile(taps.reshape(k, 1, 1, 1), (1, 1, 1, c)),
        (1, 1), "SAME", dimension_numbers=dn, feature_group_count=c,
    )
    out = jax.lax.conv_general_dilated(
        out, jnp.tile(taps.reshape(1, k, 1, 1), (1, 1, 1, c)),
        (1, 1), "SAME", dimension_numbers=dn, feature_group_count=c,
    )
    return out[0]


def _sep_conv_batched(x: jnp.ndarray, taps: jnp.ndarray) -> jnp.ndarray:
    """Separable depthwise 2-D convolution over a batch:
    (B, H, W, C) ⊛ outer(taps, taps)."""
    c = x.shape[-1]
    k = taps.shape[0]
    dn = ("NHWC", "HWIO", "NHWC")
    out = jax.lax.conv_general_dilated(
        x, jnp.tile(taps.reshape(k, 1, 1, 1), (1, 1, 1, c)),
        (1, 1), "SAME", dimension_numbers=dn, feature_group_count=c,
    )
    return jax.lax.conv_general_dilated(
        out, jnp.tile(taps.reshape(1, k, 1, 1), (1, 1, 1, c)),
        (1, 1), "SAME", dimension_numbers=dn, feature_group_count=c,
    )


def _chunk_mean_field_i8(imgs_u8, probs, taps, w1, w2, alpha, beta,
                         h, w, iters, soft):
    """Quantized-kernel chunk body (build="int8", round 3): ONE Pallas sweep
    stores the unnormalized kernel as int8 (fixed scale 127 — k ∈ [0, 1] by
    construction) plus its quantized rowsums; each mean-field iteration is
    an int8 matvec kernel reading 1 byte/element (half the bf16-M traffic,
    a quarter of f32). The normalizers fold into the q vector:
    M@q = g ⊙ (K_i8 @ (g ⊙ q)) with g = √(w1/127)·rsqrt(rowsum/127 + ε) —
    the exactly-normalized 8-bit model (see fused_build.build_kernel_i8)."""
    from critic_vae_tpu.crf.fused_build import (
        QUANT_SCALE,
        build_kernel_i8,
        matvec_i8,
    )

    c, n, _ = imgs_u8.shape
    k8, rowsum = build_kernel_i8(imgs_u8, alpha, beta, h=h, w=w)
    g = jnp.sqrt(w1 / QUANT_SCALE) * jax.lax.rsqrt(
        rowsum / QUANT_SCALE + _EPS_NORM
    )

    rowsum_s = _sep_conv(jnp.ones((h, w, 1)), taps).reshape(-1, 1) - 1.0
    ns = jax.lax.rsqrt(rowsum_s + _EPS_NORM)  # (N, 1): identical per frame
    ns_flat = jnp.tile(ns, (c, 1))  # (C·N, 1)

    probs_flat = probs.reshape(c * n, -1)
    L = probs_flat.shape[-1]
    unary = -jnp.log(jnp.maximum(probs_flat, _EPS_PROB))
    q0 = jax.nn.softmax(-unary, axis=-1)

    def step(_, q):
        msg = g * matvec_i8(k8, g * q, n=n)
        y = ns_flat * q
        sp = _sep_conv_batched(y.reshape(c, h, w, L), taps).reshape(c * n, L) - y
        msg = msg + w2 * ns_flat * sp
        return jax.nn.softmax(msg - unary, axis=-1)

    q = jax.lax.fori_loop(0, iters, step, q0).reshape(c, n, L)
    if soft:
        return q
    return jnp.argmax(q, axis=-1).astype(jnp.uint8)


def _mean_field_iterate(mb, prob, taps, w2, h, w, iters, soft=False):
    """Mean-field iterations given a prebuilt bilateral message matrix
    ``mb`` ((N, N), f32 or bf16): (N, L) probs → (N,) u8 argmax labels, or
    the (N, L) f32 marginals Q with ``soft``.

    The spatial half exploits structure the lattice can't:
    exp(-(dx²+dy²)/2γ²) is EXACTLY separable, so its message is a truncated
    separable Gaussian depthwise conv (taps span ≥8γ, where the Gaussian is
    < 1e-13 — exact to f32). The conv includes the center tap (weight 1 =
    its own q), so the j != i message subtracts it back out; same for the
    normalization rowsum. The M@Q message accumulates in f32 regardless of
    mb's storage dtype (preferred_element_type)."""
    rowsum_s = _sep_conv(jnp.ones((h, w, 1)), taps).reshape(-1, 1) - 1.0
    ns = jax.lax.rsqrt(rowsum_s + _EPS_NORM)  # (N, 1)

    unary = -jnp.log(jnp.maximum(prob, _EPS_PROB))
    q0 = jax.nn.softmax(-unary, axis=-1)
    L = prob.shape[-1]

    def step(_, q):
        msg = jnp.matmul(
            mb, q.astype(mb.dtype), preferred_element_type=jnp.float32
        )
        y = ns * q
        sp = _sep_conv(y.reshape(h, w, L), taps).reshape(-1, L) - y
        msg = msg + w2 * ns * sp
        return jax.nn.softmax(msg - unary, axis=-1)

    q = jax.lax.fori_loop(0, iters, step, q0)
    if soft:
        return q
    return jnp.argmax(q, axis=-1).astype(jnp.uint8)


def _mean_field_iterate_multi(mb, probs_tl, taps, w2, h, w, iters):
    """T INDEPENDENT mean-fields over ONE shared message matrix, packed
    into the lane dimension (round 3).

    The reference's ``-thresh`` mode refines 13 different threshold masks
    of the SAME frames (vae.py:121-123) — 13 independent CRFs whose only
    difference is the unary. The iteration matmul M @ Q is lane-pad-bound
    on the MXU (2 of 128 lanes used) and HBM-bound on M's reads, so packing
    all T mask sets as Q (N, T·L) makes the T refinements cost ~one: M is
    read once per iteration for all of them and the extra lanes ride the
    same MXU pass. Measured: the 13-threshold sweep refines ~9× faster
    than 13 sequential calls (docs/DESIGN.md).

    probs_tl: (N, T, L) — T mask sets' class probabilities.
    Returns (T, N) u8 argmax labels.
    """
    n, t, L = probs_tl.shape
    rowsum_s = _sep_conv(jnp.ones((h, w, 1)), taps).reshape(-1, 1) - 1.0
    ns = jax.lax.rsqrt(rowsum_s + _EPS_NORM).reshape(n, 1, 1)

    unary = -jnp.log(jnp.maximum(probs_tl, _EPS_PROB))
    q0 = jax.nn.softmax(-unary, axis=-1)

    def step(_, q):
        qf = q.reshape(n, t * L)
        msg = jnp.matmul(
            mb, qf.astype(mb.dtype), preferred_element_type=jnp.float32
        ).reshape(n, t, L)
        y = ns * q
        sp = _sep_conv(y.reshape(h, w, t * L), taps).reshape(n, t, L) - y
        msg = msg + w2 * ns * sp
        return jax.nn.softmax(msg - unary, axis=-1)

    q = jax.lax.fori_loop(0, iters, step, q0)
    return jnp.argmax(q, axis=-1).astype(jnp.uint8).T  # (T, N)


def _mean_field_frame(img_u8, prob, taps, w1, w2, alpha, beta, xy, h, w,
                      iters, dtype, soft=False):
    """One frame's exact mean-field with the XLA-built bilateral matrix
    ((N, 3) u8 image + (N, L) probs; see _mean_field_iterate)."""
    # bilateral features, densecrf.cpp order: (x,y)/alpha ++ rgb/beta.
    # diag_margin = (1px/alpha)²/4: half the minimum distinct-pixel
    # half-distance — excludes the i = j diagonal robustly (see
    # _normalized_kernel) for any alpha up to ~500.
    mb = _normalized_kernel(
        xy / alpha, img_u8.astype(jnp.float32) / beta, w1, dtype,
        diag_margin=0.25 / (alpha * alpha),
    )
    return _mean_field_iterate(mb, prob, taps, w2, h, w, iters, soft=soft)


def _chunk_mean_field(imgs_u8, probs, taps, w1, w2, alpha, beta, gamma,
                      h, w, iters, compute_dtype, soft, fused):
    """Shared chunk body. ``fused`` is the resolved build mode: "xla"
    (materialized gram build), "pallas" (streamed bf16/f32 M), "int8"
    (quantized kernel + int8 matvec iterations), or "vmem" (fully-fused
    resident-matrix kernel, crf/fused_resident.py)."""
    if fused == "vmem" and probs.shape[-1] == 2:
        from critic_vae_tpu.crf.fused_resident import mean_field_resident

        q = mean_field_resident(
            imgs_u8, probs, taps, w1, w2, alpha, beta, gamma,
            h=h, w=w, iters=iters,
        )
        if soft:
            return q
        return (q[..., 1] > q[..., 0]).astype(jnp.uint8)
    if fused == "vmem":  # L != 2: paired reduction does not apply
        fused = "pallas"
    if fused == "int8":
        return _chunk_mean_field_i8(
            imgs_u8, probs, taps, w1, w2, alpha, beta, h, w, iters, soft
        )
    if fused == "pallas":
        from critic_vae_tpu.crf.fused_build import build_bilateral

        mb = build_bilateral(
            imgs_u8, w1, alpha, beta, h=h, w=w, out_dtype=compute_dtype
        )
        return jax.vmap(
            lambda m, p: _mean_field_iterate(m, p, taps, w2, h, w, iters,
                                             soft=soft)
        )(mb, probs)
    xy = _coords(h, w)
    return jax.vmap(
        lambda im, p: _mean_field_frame(
            im, p, taps, w1, w2, alpha, beta, xy, h, w, iters,
            jnp.dtype(compute_dtype), soft=soft,
        )
    )(imgs_u8, probs)


@functools.partial(
    jax.jit, static_argnames=("h", "w", "iters", "compute_dtype", "soft", "fused")
)
def _crf_chunk(
    imgs_u8: jnp.ndarray,   # (C, H*W, 3) uint8
    probs: jnp.ndarray,     # (C, H*W, L) float32
    taps: jnp.ndarray,      # (K,) spatial Gaussian taps (shared, frame-independent)
    w1: jnp.ndarray,
    w2: jnp.ndarray,
    alpha: jnp.ndarray,
    beta: jnp.ndarray,
    gamma: jnp.ndarray,
    *,
    h: int,
    w: int,
    iters: int,
    compute_dtype: str,
    soft: bool = False,
    fused: str = "xla",
) -> jnp.ndarray:
    return _chunk_mean_field(
        imgs_u8, probs, taps, w1, w2, alpha, beta, gamma,
        h, w, iters, compute_dtype, soft, fused,
    )


@functools.partial(
    jax.jit, static_argnames=("h", "w", "iters", "compute_dtype", "soft", "fused")
)
def _crf_chunk_from_masks(
    imgs_u8: jnp.ndarray,   # (C, H*W, 3) uint8
    masks_u8: jnp.ndarray,  # (C, H*W) uint8 0/1 threshold masks
    taps: jnp.ndarray,
    w1: jnp.ndarray,
    w2: jnp.ndarray,
    alpha: jnp.ndarray,
    beta: jnp.ndarray,
    gamma: jnp.ndarray,
    *,
    h: int,
    w: int,
    iters: int,
    compute_dtype: str,
    soft: bool = False,
    fused: str = "xla",
) -> jnp.ndarray:
    """Mask-refinement fast path: ships the binary mask as 1 byte/px and
    builds the (1-m, m) class probabilities on device (the reference
    wrapper's construction, vae_utility.py:36-38) — 9x less host→device
    traffic than pre-built float32 probs, which dominates on tunneled/remote
    backends."""
    m = masks_u8.astype(jnp.float32)
    probs = jnp.stack([1.0 - m, m], axis=-1)
    return _chunk_mean_field(
        imgs_u8, probs, taps, w1, w2, alpha, beta, gamma,
        h, w, iters, compute_dtype, soft, fused,
    )


@functools.partial(
    jax.jit, static_argnames=("h", "w", "iters", "compute_dtype", "fused")
)
def _crf_chunk_from_masks_multi(
    imgs_u8: jnp.ndarray,    # (C, H*W, 3) uint8
    masks_u8: jnp.ndarray,   # (C, H*W, T) uint8 0/1 masks, T sets per frame
    taps: jnp.ndarray,
    w1: jnp.ndarray,
    w2: jnp.ndarray,
    alpha: jnp.ndarray,
    beta: jnp.ndarray,
    gamma: jnp.ndarray,
    *,
    h: int,
    w: int,
    iters: int,
    compute_dtype: str,
    soft: bool = False,  # accepted for driver uniformity; multi is argmax-only
    fused: str = "xla",
) -> jnp.ndarray:
    """T mask sets refined per frame against ONE shared bilateral build
    (lane-packed mean-field — see _mean_field_iterate_multi).
    Returns (C, T, H*W) u8."""
    del soft
    m = masks_u8.astype(jnp.float32)
    probs = jnp.stack([1.0 - m, m], axis=-1)  # (C, N, T, 2)
    if fused == "vmem":
        from critic_vae_tpu.crf.fused_resident import mean_field_resident

        c, n, t, _ = probs.shape
        q = mean_field_resident(
            imgs_u8, probs.reshape(c, n, t * 2), taps, w1, w2, alpha, beta,
            gamma, h=h, w=w, iters=iters,
        ).reshape(c, n, t, 2)
        return (q[..., 1] > q[..., 0]).astype(jnp.uint8).transpose(0, 2, 1)
    if fused in ("pallas", "int8"):
        # int8 resolves to the streamed bf16 build here: the lane-packed
        # matmul wants a plain M operand
        from critic_vae_tpu.crf.fused_build import build_bilateral

        dt = "bfloat16" if fused == "int8" else compute_dtype
        mb = build_bilateral(imgs_u8, w1, alpha, beta, h=h, w=w, out_dtype=dt)
        return jax.vmap(
            lambda mbf, p: _mean_field_iterate_multi(mbf, p, taps, w2, h, w, iters)
        )(mb, probs)
    xy = _coords(h, w)

    def one(im, p):
        mbf = _normalized_kernel(
            xy / alpha, im.astype(jnp.float32) / beta, w1,
            jnp.dtype(compute_dtype), diag_margin=0.25 / (alpha * alpha),
        )
        return _mean_field_iterate_multi(mbf, p, taps, w2, h, w, iters)

    return jax.vmap(one)(imgs_u8, probs)


def _spatial_taps(gamma: float, h: int, w: int) -> np.ndarray:
    """1-D taps of the separable spatial Gaussian, truncated where it is
    numerically zero (≥ 8γ ⇒ < 1e-13 of the peak) and clamped to the frame."""
    radius = min(int(np.ceil(8.0 * gamma)), max(h, w) - 1)
    k = np.arange(-radius, radius + 1, dtype=np.float32)
    return np.exp(-0.5 * (k / np.float32(gamma)) ** 2).astype(np.float32)


def _resolve_build(build: str, h: int, w: int, mesh=None) -> str:
    """Resolve a build mode to one of "xla" | "pallas" | "int8" | "vmem".

    * "xla": materialized gram build (the exact parity surface; works
      everywhere).
    * "pallas": Pallas-streamed M in ``compute_dtype`` (bf16/f32) — no N²
      f32 intermediates in HBM (crf/fused_build.build_bilateral).
    * "vmem": fully-fused resident-matrix kernel — build AND all mean-field
      iterations in one pallas_call with the (N, N) bf16 matrix living in
      VMEM; zero N² HBM traffic (crf/fused_resident.py). Needs
      N ≤ MAX_RESIDENT_N (the matrix must fit the core's VMEM) and
      2-class probabilities (the mask-refinement surface); other L fall
      back to "pallas" inside the chunk body. Measured ≈ parity with
      "pallas" (1,269 vs 1,312 f/s single-mask, same-run), NOT faster:
      Mosaic stages scratch-resident matmul operands through a copy, so
      the VMEM-resident dot costs about what the HBM-streamed dot does —
      kept as a validated opt-in with the lesson recorded in
      docs/DESIGN.md "The resident mean-field kernel".
    * "int8": quantized-kernel formulation — single-sweep int8 kernel store
      + int8 matvec iterations (1 byte/element of iteration traffic;
      crf/fused_build.build_kernel_i8/matvec_i8). Correct (segmentation
      agreement ~1.0) but measured SLOWER than "pallas" end-to-end
      (1,065 vs 1,336 f/s at 64×64): the skinny (N, 2) q/y vectors are
      lane-padded to 128 in HBM/VMEM, so the halved kernel reads are paid
      back in padded vector traffic and the MXU stays lane-pad-bound
      either way. Kept as a validated experimental mode; the lesson is
      recorded in docs/DESIGN.md.
    * "auto": "pallas" on real TPU hardware when N = H·W divides by 128;
      "xla" otherwise (CPU meshes keep the XLA build — interpret-mode
      Pallas is a per-tile Python loop).

    Under a multi-device mesh the Pallas chunk bodies are dispatched
    through ``jax.shard_map`` over the frame axis (``pallas_call`` has no
    auto-partitioning rule, but frames are embarrassingly parallel so the
    per-device body needs no collectives — see _meshed_dispatch).

    Env override: CRITIC_VAE_TPU_CRF_BUILD.
    """
    from critic_vae_tpu.crf.fused_resident import MAX_RESIDENT_N

    build = os.environ.get("CRITIC_VAE_TPU_CRF_BUILD", build)
    if build == "xla":
        return "xla"
    divisible = (h * w) % 128 == 0
    if build in ("pallas", "int8", "vmem"):
        if not divisible:
            raise ValueError(
                f"build={build!r} needs H*W divisible by 128, got {h}x{w}"
            )
        if build == "vmem" and h * w > MAX_RESIDENT_N:
            raise ValueError(
                f"build='vmem' needs H*W <= {MAX_RESIDENT_N} (the resident "
                f"matrix must fit VMEM), got {h}x{w} — use 'pallas'"
            )
        return build
    if build == "auto":
        if divisible and jax.default_backend() == "tpu":
            return "pallas"
        return "xla"
    raise ValueError(f"unknown build {build!r} (auto|xla|pallas|int8|vmem)")


def densecrf_device(
    imgs: np.ndarray,
    probs: np.ndarray,
    params: Tuple,
    *,
    frame_chunk: int = 64,
    compute_dtype: str = "float32",
    mesh=None,
    soft: bool = False,
    build: str = "xla",
) -> np.ndarray:
    """Batched exact dense CRF on the accelerator.

    Same call shape as :func:`critic_vae_tpu.crf.densecrf_batch` /
    the reference's ``denseCRF.densecrf`` loop (vae_utility.py:39):

    Args:
      imgs: (N, H, W, 3) uint8 RGB frames (a single (H, W, 3) frame works too).
      probs: (N, H, W, L) float per-class probabilities.
      params: 6-tuple (w1, alpha, beta, w2, gamma, iters).
      frame_chunk: frames per jitted dispatch; bounds the N^2 kernel
        temporaries at ``frame_chunk * (H*W)^2`` elements.
      compute_dtype: dtype of the pairwise matrices and the message matmul
        ("float32" or "bfloat16"; unary/softmax always run fp32).
      mesh: optional device mesh — chunks shard over the data axis (frames
        are embarrassingly parallel, no collectives), params replicated.
      soft: return the mean-field marginals Q instead of argmax labels —
        per-pixel CRF confidence maps, a capability the argmax-only C++
        interface (and the reference's denseCRF) cannot expose.
      build: bilateral-matrix build path — "xla" (default here: the exact
        parity surface), "pallas" (streaming VMEM build, no N² f32
        intermediates — crf/fused_build.py), "vmem" (fully-fused
        resident-matrix kernel, zero N² HBM traffic —
        crf/fused_resident.py; 2-class probs only, others fall back to
        "pallas"), or "auto" (pallas on TPU).

    Returns:
      (N, H, W) uint8 argmax labels, or (N, H, W, L) float32 marginals with
      ``soft`` (leading dim squeezed for a single frame).
    """
    single = probs.ndim == 3
    if single:
        imgs, probs = imgs[None], probs[None]
    imgs = np.ascontiguousarray(imgs, dtype=np.uint8)
    probs = np.ascontiguousarray(probs, dtype=np.float32)
    n, h, w, L = probs.shape
    if imgs.shape != (n, h, w, 3):
        raise ValueError(f"imgs shape {imgs.shape} does not match probs {probs.shape}")
    w1, alpha, beta, w2, gamma, iters = params

    out = _run_chunked(
        _crf_chunk, imgs.reshape(n, h * w, 3), probs.reshape(n, h * w, L),
        params, h, w, frame_chunk, compute_dtype, mesh=mesh, soft=soft,
        build=build,
    )
    out = out.reshape((n, h, w, L) if soft else (n, h, w))
    return out[0] if single else out


_MESHED_DISPATCH_CACHE: dict = {}


def _meshed_dispatch(chunk_fn, mesh, **statics):
    """Shard a Pallas/int8 chunk body over the mesh's data axis.

    ``pallas_call`` has no partitioning rule, so XLA cannot auto-shard the
    streamed builds the way it shards the plain-XLA chunk body. Frames are
    embarrassingly parallel (no collectives — SURVEY §2.3), so the correct
    meshed dispatch is ``jax.shard_map``: each device runs the identical
    chunk body on its local (chunk/ndev) frame slice. Callables are cached
    per (body, mesh, statics) so repeated chunks hit jit's trace cache."""
    key = (chunk_fn, mesh, tuple(sorted(statics.items())))
    fn = _MESHED_DISPATCH_CACHE.get(key)
    if fn is None:
        from jax.sharding import PartitionSpec as P

        from critic_vae_tpu.parallel.mesh import DATA_AXIS

        body = functools.partial(chunk_fn.__wrapped__, **statics)
        data, rep = P(DATA_AXIS), P()
        fn = jax.jit(jax.shard_map(
            body, mesh=mesh,
            in_specs=(data, data, rep, rep, rep, rep, rep, rep),
            out_specs=data,
            check_vma=False,
        ))
        _MESHED_DISPATCH_CACHE[key] = fn
    return fn


def _run_chunked(chunk_fn, flat_imgs, flat_second, params,
                 h, w, frame_chunk, compute_dtype, mesh=None,
                 soft=False, build: str = "xla", fetch: bool = True):
    """Dispatch fixed-size padded chunks (one compile) and overlap the
    device work of chunk i+1 with the host fetch of chunk i.  With a
    ``mesh``, chunks are sharded over the data axis (frames are
    embarrassingly parallel — no collectives) and the chunk size is rounded
    up to a multiple of the mesh size.  ``soft`` collects (n, N, L) f32
    marginals instead of (n, N) u8 argmax labels.  ``fetch=False`` keeps
    the result ON DEVICE (trimmed chunk concat, single-process only) —
    callers that only reduce the refinement (IoU scoring) then never pay
    the bulk device→host fetch, which through this mount's tunnel costs
    more than the mean-field itself (docs/DESIGN.md)."""
    w1, alpha, beta, w2, gamma, iters = params
    fused = _resolve_build(build, h, w, mesh)
    taps = _spatial_taps(float(gamma), h, w)
    n = len(flat_imgs)
    frame_chunk = min(frame_chunk, n)  # don't pad tiny corpora up to the chunk
    # Cap the chunk so the per-chunk N^2 bilateral matrices stay within a
    # few GB of HBM: at 64x64 the default chunk of 64 is ~4.3 GB fp32, but
    # N^2 grows with the 4th power of resolution (128x128 -> 1 GB/frame).
    # "vmem" keeps the matrix entirely in VMEM — no N² HBM residency, no cap.
    if fused != "vmem":
        elem_bytes = {"int8": 1}.get(
            fused, 2 if compute_dtype == "bfloat16" else 4
        )
        bytes_per_frame = (h * w) ** 2 * elem_bytes
        mem_budget = int(os.environ.get("CRITIC_VAE_TPU_CRF_MEM", 6 * 1024**3))
        frame_chunk = max(1, min(frame_chunk, mem_budget // bytes_per_frame))
    if mesh is not None:
        from critic_vae_tpu.parallel.mesh import (
            batch_sharding,
            replicate,
            shard_batch,
        )

        frame_chunk += (-frame_chunk) % mesh.devices.size
        taps = replicate(mesh, jnp.asarray(taps))

        def put(a):
            if isinstance(a, jax.Array):
                # already device-resident (crf_param_search pre-puts the
                # sharded corpus once): reshard the chunk slice on device —
                # no host round-trip per grid combination
                return jax.device_put(a, batch_sharding(mesh, a.ndim))
            return shard_batch(mesh, a)
    else:
        taps = jnp.asarray(taps)
        put = jnp.asarray
    if n == 0:
        L = flat_second.shape[-1] if flat_second.ndim == 3 else 2
        shape = (0, h * w, L) if soft else (0, h * w)
        empty = np.empty(shape, np.float32 if soft else np.uint8)
        return empty if fetch else jnp.asarray(empty)
    statics = dict(h=h, w=w, iters=int(iters), compute_dtype=compute_dtype,
                   soft=soft, fused=fused)
    meshed = mesh is not None and mesh.devices.size > 1
    if meshed and fused != "xla":
        call = _meshed_dispatch(chunk_fn, mesh, **statics)
    else:
        call = functools.partial(chunk_fn, **statics)
    out = None  # allocated from the first fetched chunk's shape/dtype
    pending = []  # (start, valid, device segs)

    def _store(j, v, s):
        nonlocal out
        host = np.asarray(jax.device_get(s))
        if out is None:
            out = np.empty((n,) + host.shape[1:], host.dtype)
        out[j : j + v] = host[:v]

    # inputs may already be device arrays (crf_param_search device-puts the
    # corpus ONCE and reuses it across grid combinations) — pad/concat must
    # then stay on device instead of round-tripping through numpy; each
    # argument is host/device independently
    def _pad(arr, pad):
        xp = jnp if isinstance(arr, jax.Array) else np
        return xp.concatenate([arr, xp.repeat(arr[-1:], pad, 0)])

    device_segs = []  # fetch=False: trimmed device-resident segments
    for i in range(0, n, frame_chunk):
        chunk_imgs = flat_imgs[i : i + frame_chunk]
        chunk_2nd = flat_second[i : i + frame_chunk]
        valid = len(chunk_imgs)
        if valid < frame_chunk:
            chunk_imgs = _pad(chunk_imgs, frame_chunk - valid)
            chunk_2nd = _pad(chunk_2nd, frame_chunk - valid)
        seg = call(
            put(chunk_imgs), put(chunk_2nd), taps,
            jnp.float32(w1), jnp.float32(w2),
            jnp.float32(alpha), jnp.float32(beta), jnp.float32(gamma),
        )
        if not fetch:
            device_segs.append(seg[:valid])
            continue
        pending.append((i, valid, seg))
        if len(pending) > 1:  # fetch the previous chunk while this one runs
            _store(*pending.pop(0))
    if not fetch:
        return (
            device_segs[0]
            if len(device_segs) == 1
            else jnp.concatenate(device_segs)
        )
    for item in pending:
        _store(*item)
    return out


@jax.jit
def _iou_counts(pred, gt):
    """Whole-stack (tp, fn, fp) int32 counts on device — ops/iou.py
    semantics (0/0 → 1, exact integer division) are applied by the caller
    from the fetched scalars."""
    p = pred.astype(bool)
    g = gt.astype(bool)
    tp = jnp.sum(p & g, dtype=jnp.int32)
    fn = jnp.sum(~p & g, dtype=jnp.int32)
    fp = jnp.sum(p & ~g, dtype=jnp.int32)
    return tp, fn, fp


def crf_param_search(
    frames_u8: np.ndarray,
    thr_masks: np.ndarray,
    gt: np.ndarray,
    param_grid: dict | None = None,
    *,
    frame_chunk: int = 64,
    compute_dtype: str = "auto",
    mesh=None,
    build: str = "auto",
):
    """A real CRF hyperparameter search, on device.

    The reference ships a grid-search scaffold that is degenerate (one
    combination, vae_utility.py:25-30) and quirky (each combination
    re-refines the previous one's output through a mutated NumPy view) —
    faithfully reproduced in :func:`critic_vae_tpu.crf.crf_reference_scaffold`.
    This is the capability the scaffold gestures at: every combination
    independently refines the ORIGINAL threshold masks and is scored by
    whole-stack IoU against ground truth.  At ~1k frames/s on one chip a
    10-combination sweep over a 550-frame episode takes seconds; on the
    host lattice it was minutes, which is presumably why the reference
    never ran one.

    Combinations that differ only in (w1, w2, alpha, beta) reuse the same
    compiled program (they are traced scalars); each distinct ``iters`` —
    and each ``gamma`` whose truncated tap count differs — compiles once.

    Args:
      param_grid: dict of lists with keys w1/alpha/beta/w2/gamma/iters
        (missing keys default to the reference's fixed value).

    Returns:
      (best_masks, results): ``results`` is a descending-IoU list of
      ``(iou, params6)``; ``best_masks`` is the (N, H, W) bool refinement
      from the winning combination.
    """
    import itertools

    keys = ("w1", "alpha", "beta", "w2", "gamma", "iters")
    if param_grid:
        bad = set(param_grid) - set(keys)
        if bad:
            raise ValueError(
                f"unknown CRF grid key(s) {sorted(bad)}; valid: {list(keys)}"
            )
        empty = [k for k, v in param_grid.items() if not v]
        if empty:
            raise ValueError(f"CRF grid key(s) {empty} have no values")
    grid = {**DEFAULT_PARAM_GRID, **(param_grid or {})}
    combos = [dict(zip(grid.keys(), v)) for v in itertools.product(*grid.values())]

    gt = np.asarray(gt, bool)
    n_frames = len(frames_u8)
    # Ship the corpus ONCE; every grid combination reuses it in place.
    # Meshed searches pre-shard along the frame axis — chunk slices are then
    # resharded on device (see _run_chunked.put), eliminating the
    # per-combination host upload the round-2 verdict flagged. Sharding
    # needs the frame axis divisible by the mesh, so the corpus is padded
    # by repeating the last frame (the reference 550-frame slice is not a
    # multiple of 8) and every combination's refinement is trimmed back.
    if mesh is None:
        frames_u8 = jax.device_put(np.ascontiguousarray(frames_u8, dtype=np.uint8))
        thr_masks = jax.device_put(
            np.ascontiguousarray(thr_masks, dtype=np.uint8)
        )
    else:
        from critic_vae_tpu.parallel.mesh import shard_batch

        pad = (-n_frames) % mesh.devices.size
        frames_u8 = np.ascontiguousarray(frames_u8, dtype=np.uint8)
        thr_masks = np.ascontiguousarray(thr_masks, dtype=np.uint8)
        if pad:
            frames_u8 = np.concatenate(
                [frames_u8, np.repeat(frames_u8[-1:], pad, 0)]
            )
            thr_masks = np.concatenate(
                [thr_masks, np.repeat(thr_masks[-1:], pad, 0)]
            )
        frames_u8 = shard_batch(mesh, frames_u8)
        thr_masks = shard_batch(mesh, thr_masks)
    # Score every combination ON DEVICE: the refinement never crosses the
    # tunnel (fetch=False) and each combination fetches three int32 counts
    # instead of the full (N, H, W) stack — through this mount's ~13 MB/s
    # device→host path the per-combination fetch used to cost more than the
    # mean-field itself. Single-process only (the multi-host chunk concat
    # needs fully-addressable arrays); multi-host searches keep the host
    # scoring path. int32 counts are exact below 2^31 mask pixels (~500k
    # frames at 64×64 — far past any search corpus).
    on_device = jax.process_count() == 1
    gt_dev = jnp.asarray(gt) if on_device else None
    results = []
    best = None
    for c in combos:
        params = tuple(c[k] for k in keys)
        refined = refine_masks_device(
            frames_u8, thr_masks, params,
            frame_chunk=frame_chunk, compute_dtype=compute_dtype, mesh=mesh,
            build=build, fetch=not on_device,
        )[:n_frames]
        if on_device:
            tp, fn, fp = jax.device_get(_iou_counts(refined, gt_dev))
            union = int(tp) + int(fn) + int(fp)
            score = 1.0 if union == 0 else int(tp) / union
        else:
            score = iou_metric(gt, refined, round_digits=None)
        results.append((score, params))
        if best is None or score > best[0]:
            best = (score, refined)
    results.sort(key=lambda r: r[0], reverse=True)
    best_masks = best[1]
    if isinstance(best_masks, jax.Array):
        best_masks = np.asarray(jax.device_get(best_masks)).astype(bool)
    return best_masks, results


def refine_masks_device(
    frames_u8: np.ndarray,
    thr_masks: np.ndarray,
    params=REFERENCE_CRF_PARAMS,
    *,
    frame_chunk: int = 64,
    compute_dtype: str = "auto",
    mesh=None,
    build: str = "auto",
    fetch: bool = True,
):
    """Device-CRF counterpart of :func:`critic_vae_tpu.crf.refine_masks`
    (the reference ``crf()`` wrapper's probability construction,
    vae_utility.py:36-38): classes are the stacked (1-mask, mask) planes,
    built on device from the uint8 mask (see _crf_chunk_from_masks).

    ``frames_u8``/``thr_masks`` may be device arrays (already uint8) —
    they are then used in place with no host round-trip.

    Defaults differ from :func:`densecrf_device` (the exact parity surface):
    this is the production mask-refinement path, so ``build="auto"`` takes
    the Pallas streaming build on real TPU hardware and ``compute_dtype=
    "auto"`` then stores the bilateral matrix in bf16 — halving the
    HBM traffic that is this op's roofline (measured ≥99.9% segmentation
    agreement with the f32/XLA formulation on the synthetic corpus; see
    docs/DESIGN.md). The fully-fused resident-matrix kernel is available
    as the explicit opt-in ``build="vmem"`` (measured ≈ parity with
    "pallas" — see docs/DESIGN.md "The resident mean-field kernel"). On
    CPU or with ``build="xla"``, "auto" means f32 and results are
    identical to round 2.

    ``fetch=False`` returns the (N, H, W) bool refinement as a DEVICE
    array (single-process only) — callers that only reduce it (e.g.
    ``crf_param_search`` scoring one IoU per grid combination) skip the
    bulk device→host fetch entirely."""
    if not isinstance(frames_u8, jax.Array):
        frames_u8 = np.ascontiguousarray(frames_u8, dtype=np.uint8)
    n, h, w_, _ = frames_u8.shape
    if thr_masks.shape != (n, h, w_):
        raise ValueError(
            f"thr_masks shape {thr_masks.shape} does not match frames {frames_u8.shape}"
        )
    if isinstance(thr_masks, jax.Array):
        masks_u8 = thr_masks.astype(jnp.uint8).reshape(n, h * w_)
    else:
        masks_u8 = np.ascontiguousarray(thr_masks, dtype=np.uint8).reshape(n, h * w_)
    if compute_dtype == "auto":
        mode = _resolve_build(build, h, w_, mesh)
        # "pallas" stores M in compute_dtype -> bf16 for the fast path;
        # "vmem"/"int8" fix their own storage dtype; "xla" keeps the
        # round-2 f32 default
        compute_dtype = "bfloat16" if mode in ("pallas", "vmem") else "float32"

    out = _run_chunked(
        _crf_chunk_from_masks, frames_u8.reshape(n, h * w_, 3), masks_u8,
        params, h, w_, frame_chunk, compute_dtype, mesh=mesh, build=build,
        fetch=fetch,
    )
    return out.reshape(n, h, w_).astype(bool)


def refine_masks_multi_device(
    frames_u8: np.ndarray,
    thr_masks_multi: np.ndarray,
    params=REFERENCE_CRF_PARAMS,
    *,
    frame_chunk: int = 64,
    compute_dtype: str = "auto",
    mesh=None,
    build: str = "auto",
    fetch: bool = True,
):
    """Refine T mask sets of the SAME frames in one pass — the reference's
    threshold-sweep workload (vae.py:121-123 re-runs its entire pipeline
    per threshold; here even the CRF's bilateral build and its per-iteration
    matrix reads are shared across all T thresholds via lane packing, see
    _mean_field_iterate_multi).

    Args:
      frames_u8: (F, H, W, 3) uint8 frames.
      thr_masks_multi: (T, F, H, W) boolean/0-1 masks — T sets per frame.

    Returns (T, F, H, W) bool refined masks; each slice equals
    ``refine_masks_device(frames, thr_masks_multi[t], params)`` (asserted
    by tests/test_crf_device.py).

    ``frames_u8``/``thr_masks_multi`` may be device arrays — like the
    single-mask path they are then used in place (the transpose runs on
    device) with no host round-trip; coercing them through numpy here
    made device-resident sweep callers transfer-bound through the tunnel.
    ``fetch=False`` likewise keeps the (T, F, H, W) bool result on device
    (single-process only) — the sweep scores it with one reduction, so the
    refined stack (~27 MB at episode scale) never crosses the tunnel.
    """
    if not isinstance(frames_u8, jax.Array):
        frames_u8 = np.ascontiguousarray(frames_u8, dtype=np.uint8)
    f, h, w_, _ = frames_u8.shape
    t = len(thr_masks_multi)
    if thr_masks_multi.shape != (t, f, h, w_):
        raise ValueError(
            f"thr_masks_multi shape {thr_masks_multi.shape} does not match "
            f"(T, {f}, {h}, {w_})"
        )
    # frame-major so the chunk driver slices/pads along frames
    if isinstance(thr_masks_multi, jax.Array):
        masks_fm = (
            thr_masks_multi.astype(jnp.uint8)
            .transpose(1, 2, 3, 0)
            .reshape(f, h * w_, t)
        )
    else:
        masks_fm = np.ascontiguousarray(
            np.asarray(thr_masks_multi, np.uint8).transpose(1, 2, 3, 0)
        ).reshape(f, h * w_, t)
    if compute_dtype == "auto":
        mode = _resolve_build(build, h, w_, mesh)
        compute_dtype = (
            "bfloat16" if mode in ("pallas", "int8", "vmem") else "float32"
        )
    out = _run_chunked(
        _crf_chunk_from_masks_multi, frames_u8.reshape(f, h * w_, 3),
        masks_fm, params, h, w_, frame_chunk, compute_dtype, mesh=mesh,
        build=build, fetch=fetch,
    )  # (F, T, N)
    return out.transpose(1, 0, 2).reshape(t, f, h, w_).astype(bool)
