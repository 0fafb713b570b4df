"""Fully-fused VMEM-resident dense-CRF mean-field (round 3, second pass).

The round-3 streaming build (``crf/fused_build.py``) removed the N² f32
build intermediate, leaving the measured floor at the bf16 message matrix's
HBM traffic: one 33.5 MB store (build) + ten 33.5 MB reads (iterations) per
64×64 frame. This kernel removes the message matrix from HBM entirely:

  * the v5e core has enough VMEM (128 MiB) to hold the whole (N, N) bf16
    matrix for N = H·W ≤ 4096, so the matrix lives in a VMEM scratch for
    the frame's full lifetime — build, normalize, and all mean-field
    iterations run inside ONE ``pallas_call`` per frame, and the only
    per-frame HBM traffic is the (N, 8) features in and the (N, 2T)
    marginals out (~0.3 MB, vs ~370 MB for the streamed path);
  * the SPATIAL Potts term is folded into the same resident matrix:
    K_s = exp(-½‖Δxy/γ‖²) is computed from its own scaled position columns
    and its j≠i symmetric normalizer has the closed separable form
    rsqrt(conv2d(1; g⊗g) − 1) evaluated once outside the kernel — so an
    iteration is a single resident matmul, with no separable-conv stage
    and no per-iteration XLA glue at all (the reference model's full
    pairwise energy, vae_utility.py:25-30, in one operand);
  * mean-field updates use the paired-class reduction: classes ride the
    lane axis as (neg, pos) pairs — (N, 2T) for T independent mask sets of
    the same frame (T = 1 single mask; T = 13 the reference's ``-thresh``
    sweep, vae.py:121-123) — and the per-pair softmax is
    sigmoid(z − z·PERM) with PERM the (2T, 2T) pair-swap permutation
    (2-class softmax ≡ sigmoid of the logit difference, exactly).

Scheduling: the frame's phases ride a second grid dimension —
``grid = (C, iters + 1)`` with phase 0 the build and each later phase one
mean-field iteration, state carried across phases in the VMEM scratches
(TPU grids execute sequentially, so this is a legal carry). This is the
load-bearing structural choice: with build sweeps and the iteration loop
in ONE kernel body, Mosaic's allocator keeps every unrolled sweep tile's
f32 temporaries (8 MB each) live across the loop and the kernel dies of a
compile-time scoped-VMEM OOM at 148 MB (measured; a dynamic fori_loop trip
count does NOT fix it — the loop *body* spills). Splitting the phases at a
grid-step boundary ends the sweeps' live ranges before the first iteration
and the same kernel fits in 123 MB (measured on the v5e; see
docs/DESIGN.md "The resident mean-field kernel").

Numerics: identical feature construction to the streamed build
(per-coordinate f32 differences — exact zero diagonal by cancellation, the
``logp < 0`` predicate excludes exactly the diagonal); the bilateral kernel
is stored bf16 once and its normalizers are computed from the f32 rowsums
(same rounding surface as ``fused_build.build_bilateral``). The spatial
term adds bf16 rounding the streamed path's f32 separable conv did not
have; measured segmentation agreement with the f32/XLA formulation is
≥99.9% (tests/test_crf_device.py).

Mosaic constraints honored (CLAUDE.md): all refs pure 2-D; the (1, N)
transposed rowsum is accumulated directly from the symmetric tile sums
(no in-kernel vector transposes); lane-axis pair swaps go through a tiny
(2T, 2T) matmul instead of strided lane slicing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS_PROB = 1e-8   # densecrf.cpp unary clamp (crf/device.py::_EPS_PROB)
_EPS_NORM = 1e-20  # densecrf.cpp norm epsilon

# v5e VMEM is 128 MiB; the resident matrix (N² bf16) plus I/O blocks,
# sweep temporaries, and spill slots must fit. The full kernel measures
# 123 MB scoped at N = 4096 (64×64) — at the capacity, which is why the
# limit below is the whole core.
VMEM_LIMIT_BYTES = 128 * 1024 * 1024
MAX_RESIDENT_N = 4096


def _resident_kernel(w1_ref, w2_ref, feats_ref, featsT_ref,
                     probs_ref, out_ref, m_ref, rs_ref, rsT_ref, q_ref,
                     msg_ref, *, nt, tile, iters):
    """Grid point (ci, s): phase s = 0 builds M_total into VMEM for frame
    ci; each phase 1 ≤ s ≤ iters runs one mean-field iteration; phase
    ``iters`` additionally emits the marginals (iters = 0 ⇒ build + emit in
    the one phase: the clamped renormalized input distribution).

    feats columns: 0-1 = xy/α, 2-4 = rgb/β, 5 = spatial normalizer
    rsqrt(Σ_{j≠i} K_s), 6-7 = xy/γ.  probs/out: (N, 2T) paired classes.
    The unary −log p̃ is stashed in the OUTPUT block between phases (its
    block index is constant in s, so it persists like a scratch) and only
    overwritten by the final marginals.

    Both build sweeps use STATIC full-row (tile, N) slices — dynamic
    lane-offset tile slicing was measured ~2× slower on Mosaic (relayout
    shifts), and full rows let the transposed normalizer accumulate as a
    plain full-lane sum.
    """
    s = pl.program_id(1)

    p = probs_ref[...]
    pw = p.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, (pw, pw), 0)
    row = jax.lax.broadcasted_iota(jnp.int32, (pw, pw), 1)
    partner = col + 1 - 2 * (col % 2)  # 2t ↔ 2t+1
    perm = (row == partner).astype(jnp.float32)

    def pair_softmax(z):
        # HIGHEST: the MXU's default bf16 operand rounding would jitter the
        # pair-swapped logits by ~0.4% (z carries unaries up to ~18.4);
        # the permutation dot is (N, 2T)@(2T, 2T) — full precision is free
        zp = jnp.dot(z, perm, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        return jax.nn.sigmoid(z - zp)

    @pl.when(s == 0)
    def _build():
        rsT_ref[...] = jnp.zeros_like(rsT_ref)
        for i in range(nt):
            ri = slice(i * tile, (i + 1) * tile)
            dp0 = feats_ref[ri, 0:1] - featsT_ref[0:1, :]
            dp1 = feats_ref[ri, 1:2] - featsT_ref[1:2, :]
            logp = -0.5 * (dp0 * dp0 + dp1 * dp1)
            dc0 = feats_ref[ri, 2:3] - featsT_ref[2:3, :]
            dc1 = feats_ref[ri, 3:4] - featsT_ref[3:4, :]
            dc2 = feats_ref[ri, 4:5] - featsT_ref[4:5, :]
            logc = -0.5 * (dc0 * dc0 + dc1 * dc1 + dc2 * dc2)
            # distinct pixels always differ in position: logp < 0 holds
            # with margin (1px/α)²/2, and is exactly 0 at i = j (the
            # per-coordinate subtraction cancels bit-for-bit) — the same
            # predicate as fused_build
            k = jnp.where(logp < 0.0, jnp.exp(logp + logc), 0.0)
            m_ref[ri, :] = k.astype(m_ref.dtype)
            rs_ref[ri, :] = jnp.sum(k, axis=1, keepdims=True)
            # K is symmetric: the transposed normalizer is the accumulated
            # column sums — no (N,1)→(1,N) transpose needed in-kernel
            rsT_ref[...] += jnp.sum(k, axis=0, keepdims=True)

        # overwrite the rowsum scratches with the √w1-folded normalizers
        sw1 = jnp.sqrt(w1_ref[0, 0])
        rs_ref[...] = sw1 * jax.lax.rsqrt(rs_ref[...] + _EPS_NORM)
        rsT_ref[...] = sw1 * jax.lax.rsqrt(rsT_ref[...] + _EPS_NORM)
        sw2 = jnp.sqrt(w2_ref[0, 0])
        gsT = sw2 * featsT_ref[5:6, :]
        gbT = rsT_ref[...]

        for i in range(nt):
            ri = slice(i * tile, (i + 1) * tile)
            dg0 = feats_ref[ri, 6:7] - featsT_ref[6:7, :]
            dg1 = feats_ref[ri, 7:8] - featsT_ref[7:8, :]
            logs = -0.5 * (dg0 * dg0 + dg1 * dg1)
            ks = jnp.where(logs < 0.0, jnp.exp(logs), 0.0)
            kb = m_ref[ri, :].astype(jnp.float32)
            mb = (rs_ref[ri, :] * gbT) * kb
            ms = (sw2 * feats_ref[ri, 5:6]) * gsT * ks
            m_ref[ri, :] = (mb + ms).astype(m_ref.dtype)

        out_ref[...] = -jnp.log(jnp.maximum(p, _EPS_PROB))  # the unary
        q_ref[...] = pair_softmax(-out_ref[...])

    @pl.when(s > 0)
    def _iterate():
        # row-tiled resident dot: one full-matrix dot makes the register
        # allocator spill an f32 staging copy of M (~101 MB — measured OOM
        # over the 128 MiB VMEM); (tile, N) dots keep staging per-tile
        qb = q_ref[...].astype(m_ref.dtype)
        for i in range(nt):
            ri = slice(i * tile, (i + 1) * tile)
            msg_ref[ri, :] = jnp.dot(m_ref[ri, :], qb,
                                     preferred_element_type=jnp.float32)
        q_ref[...] = pair_softmax(msg_ref[...] - out_ref[...])

    @pl.when(s == iters)
    def _emit():
        out_ref[...] = q_ref[...]


def _pick_tile(n: int) -> int:
    # 256 (not 512): the sweeps' per-tile f32 temporaries are what crowd
    # the 128 MiB core at N = 4096, and 256-row tiles measured the same
    # wall clock as 512 on the v5e
    for t in (256, 128):
        if n % t == 0:
            return t
    raise ValueError(f"N={n} not a multiple of 128; use the XLA build")


@functools.partial(jax.jit, static_argnames=("h", "w", "iters"))
def _resident_chunk(feats, featsT, probs_pairs, w1, w2, *, h, w, iters):
    """(C·N, 8) feats / (8, C·N) featsT / (C·N, 2T) paired probs →
    (C·N, 2T) f32 mean-field marginals."""
    cn, pw = probs_pairs.shape
    n = h * w
    c = cn // n
    tile = _pick_tile(n)
    nt = n // tile
    interp = jax.default_backend() != "tpu"
    return pl.pallas_call(
        functools.partial(_resident_kernel, nt=nt, tile=tile, iters=iters),
        grid=(c, iters + 1),
        in_specs=[
            pl.BlockSpec((1, 1), lambda ci, s: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda ci, s: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((n, 8), lambda ci, s: (ci, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, n), lambda ci, s: (0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, pw), lambda ci, s: (ci, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n, pw), lambda ci, s: (ci, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((cn, pw), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((n, n), jnp.bfloat16),
            pltpu.VMEM((n, 1), jnp.float32),
            pltpu.VMEM((1, n), jnp.float32),
            pltpu.VMEM((n, pw), jnp.float32),
            pltpu.VMEM((n, pw), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES),
        interpret=interp,
    )(jnp.reshape(w1, (1, 1)), jnp.reshape(w2, (1, 1)), feats, featsT,
      probs_pairs)


def mean_field_resident(imgs_u8, probs_pairs, taps, w1, w2, alpha, beta,
                        gamma, *, h: int, w: int, iters: int):
    """Resident-matrix mean-field over a chunk.

    Args:
      imgs_u8: (C, N, 3) uint8 frames.
      probs_pairs: (C, N, 2T) float32 — T (neg, pos) class pairs per pixel
        (T independent mask sets refined against the one resident matrix).
      taps: (K,) spatial Gaussian taps (for the closed-form normalizer).
      w1/w2/alpha/beta/gamma: traced reference CRF scalars.

    Returns (C, N, 2T) float32 marginals; argmax per pair = q_pos > q_neg.
    """
    from critic_vae_tpu.crf.device import _coords, _sep_conv

    c, n, _ = imgs_u8.shape
    xy = _coords(h, w)  # (N, 2) f32
    rowsum_s = _sep_conv(jnp.ones((h, w, 1)), taps).reshape(-1, 1) - 1.0
    ns = jax.lax.rsqrt(rowsum_s + _EPS_NORM)  # (N, 1)
    base = jnp.concatenate([xy / alpha, jnp.zeros((n, 3)), ns, xy / gamma],
                           axis=-1)  # (N, 8) frame-independent columns
    col = imgs_u8.astype(jnp.float32) / beta  # (C, N, 3)
    feats = jnp.broadcast_to(base[None], (c, n, 8)).at[:, :, 2:5].set(col)
    featsT = jnp.transpose(feats, (2, 0, 1)).reshape(8, c * n)
    feats = feats.reshape(c * n, 8)
    q = _resident_chunk(
        feats, featsT, probs_pairs.reshape(c * n, -1),
        jnp.float32(w1), jnp.float32(w2), h=h, w=w, iters=int(iters),
    )
    return q.reshape(c, n, -1)
