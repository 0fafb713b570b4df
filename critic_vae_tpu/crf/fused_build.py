"""Pallas-fused bilateral kernel build for the device CRF.

Round-2 roofline (docs/DESIGN.md): the device CRF runs at the HBM speed of
light *for the materialized-N² formulation* — per 64×64 frame, building the
f32 bilateral message matrix M (67 MB) plus 10 mean-field iteration reads
(670 MB) ≈ 740 MB at ~819 GB/s ≈ 0.9 ms. The formulation, not physics, is
the wall: the XLA build materializes the f32 N×N exp() intermediate (gram →
exp → rowsum → scale needs two passes over a stored matrix), and a plain
bf16 ``compute_dtype`` halves only the iteration reads, leaving the f32
build dominant.

This module removes the build from the roofline entirely. Two Pallas
kernels stream (T, T) tiles of the kernel matrix through VMEM without ever
writing the f32 intermediate to HBM:

  pass 1  rowsum_j exp(-½‖f_i−f_j‖²) per row, diagonal excluded — K is
          recomputed per tile in registers/VMEM and only the (N,) rowsum
          leaves the kernel;
  pass 2  M = √w1·n_i · √w1·n_j · K streamed straight to **bf16** tiles —
          the only N² HBM write is 2 bytes/element.

Per-frame traffic drops to 33 MB (build) + 10×33 MB (iterations) ≈ 365 MB →
~2× the round-2 frames/s; and at 128×128 (N=16384) the only N² residency is
the 512 MB bf16 M, so full-resolution frames fit where the XLA build's f32
temporaries did not.

Numerics: half-distances are computed per-coordinate (xi−xj)² in f32 — no
Gram matmul, so no ``Precision.HIGHEST`` concern (the MXU is not involved)
and the i = j diagonal is *exactly* zero by construction (the same
subtraction-cancellation argument as crf/device.py::_normalized_kernel,
without needing the Gram trick). Only the final M store rounds to bf16;
mean-field accumulates the M@Q messages in f32.

Mosaic constraints honored (CLAUDE.md): every ref is pure 2-D — frames are
flattened into the row axis ((C·N, …) layouts) and column-side features are
passed pre-transposed, so the kernel contains no reshapes or transposes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from critic_vae_tpu.crf.device import _EPS_NORM


def _pick_tile(n: int) -> int | None:
    """Largest of 512/256/128 dividing N (None → caller falls back to XLA)."""
    for t in (512, 256, 128):
        if n % t == 0:
            return t
    return None


def _k_tile(pos_ref, posT_ref, col_ref, colT_ref):
    """One (T, T) tile of the bilateral kernel exp(-½‖Δxy‖² − ½‖Δrgb‖²)
    with the diagonal (and only the diagonal) exactly zero.

    Features arrive pre-scaled (xy/α, rgb/β). Distinct pixels always differ
    in position, so the positional half-distance is strictly negative with
    margin (1px/α)²/2 — the ``logp < 0`` predicate cannot be blurred by the
    (much larger) color terms, which enter only through logc."""
    xi = pos_ref[...]  # (T, 2)
    xjT = posT_ref[...]  # (2, T)
    dp0 = xi[:, 0:1] - xjT[0:1, :]
    dp1 = xi[:, 1:2] - xjT[1:2, :]
    logp = -0.5 * (dp0 * dp0 + dp1 * dp1)
    ci = col_ref[...]  # (T, 3)
    cjT = colT_ref[...]  # (3, T)
    dc0 = ci[:, 0:1] - cjT[0:1, :]
    dc1 = ci[:, 1:2] - cjT[1:2, :]
    dc2 = ci[:, 2:3] - cjT[2:3, :]
    logc = -0.5 * (dc0 * dc0 + dc1 * dc1 + dc2 * dc2)
    return jnp.where(logp < 0.0, jnp.exp(logp + logc), 0.0)


def _rowsum_kernel(pos_ref, posT_ref, col_ref, colT_ref, out_ref):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    k = _k_tile(pos_ref, posT_ref, col_ref, colT_ref)
    out_ref[...] += jnp.sum(k, axis=1, keepdims=True)  # (T, 1)


def _build_kernel(pos_ref, posT_ref, col_ref, colT_ref, nrow_ref, ncolT_ref,
                  out_ref):
    k = _k_tile(pos_ref, posT_ref, col_ref, colT_ref)
    m = (nrow_ref[...] * ncolT_ref[...]) * k  # (T,1)*(1,T)*(T,T)
    out_ref[...] = m.astype(out_ref.dtype)


def build_bilateral(imgs_u8, w1, alpha, beta, *, h: int, w: int,
                    out_dtype: str = "bfloat16"):
    """(C, N, 3) uint8 frames → (C, N, N) bf16 normalized bilateral message
    matrices  M = w1 · (n nᵀ) ⊙ K,  n = 1/√(K@1 + ε),  diag(M) = 0.

    Matches crf/device.py::_normalized_kernel numerically (f32 throughout;
    only the final store rounds to ``out_dtype``). √w1 is folded into n so
    the kernels take no scalar operands."""
    c, n, _ = imgs_u8.shape
    tile = _pick_tile(n)
    if tile is None:
        raise ValueError(f"N={n} not a multiple of 128; use the XLA build")
    nt = n // tile

    from critic_vae_tpu.crf.device import _coords

    pos = _coords(h, w) / alpha  # (N, 2) f32
    posT = pos.T  # (2, N)
    col = imgs_u8.astype(jnp.float32) / beta  # (C, N, 3)
    col_flat = col.reshape(c * n, 3)
    # Mosaic block-shape rule: the 2nd-to-last block dim must be a multiple
    # of 8 OR equal to the full array dim — so the transposed operands put
    # their small axis FIRST and flatten frames into the lane axis:
    # colT (3, C·N) block (3, T); nvecT (1, C·N) block (1, T).
    colT_flat = jnp.transpose(col, (2, 0, 1)).reshape(3, c * n)

    interp = jax.default_backend() != "tpu"
    grid = (c, nt, nt)

    rowsum = pl.pallas_call(
        _rowsum_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, 2), lambda ci, i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, tile), lambda ci, i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 3), lambda ci, i, j, nt=nt: (ci * nt + i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tile), lambda ci, i, j, nt=nt: (0, ci * nt + j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile, 1), lambda ci, i, j, nt=nt: (ci * nt + i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((c * n, 1), jnp.float32),
        interpret=interp,
    )(pos, posT, col_flat, colT_flat)

    # √w1 folded into the normalizer: M = (√w1·n_i)(√w1·n_j)·K
    nvec = jnp.sqrt(w1) * jax.lax.rsqrt(rowsum + _EPS_NORM)  # (C·N, 1) f32
    ncolT = nvec.reshape(1, c * n)  # (1, C·N): lane-major for column blocks

    m_flat = pl.pallas_call(
        _build_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, 2), lambda ci, i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, tile), lambda ci, i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 3), lambda ci, i, j, nt=nt: (ci * nt + i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tile), lambda ci, i, j, nt=nt: (0, ci * nt + j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda ci, i, j, nt=nt: (ci * nt + i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda ci, i, j, nt=nt: (0, ci * nt + j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile, tile), lambda ci, i, j, nt=nt: (ci * nt + i, j),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((c * n, n), jnp.dtype(out_dtype)),
        interpret=interp,
    )(pos, posT, col_flat, colT_flat, nvec, ncolT)
    return m_flat.reshape(c, n, n)


QUANT_SCALE = 127.0  # int8 fixed scale for k in [0, 1) (f32->i8 is the
# one single-step float->8-bit cast Mosaic lowers; uint8 would need a
# 3-cast chain through int32 on both store and load)


def _build_i8_kernel(pos_ref, posT_ref, col_ref, colT_ref, k8_ref,
                     rowsum_ref):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        rowsum_ref[...] = jnp.zeros_like(rowsum_ref)

    k = _k_tile(pos_ref, posT_ref, col_ref, colT_ref)
    q = jnp.round(k * QUANT_SCALE)
    k8_ref[...] = q.astype(jnp.int8)
    # rowsum of the QUANTIZED kernel (self-consistent normalization of the
    # 8-bit model); values <= 127*N < 2^24, exact in f32
    rowsum_ref[...] += jnp.sum(q, axis=1, keepdims=True)


def build_kernel_i8(imgs_u8, alpha, beta, *, h: int, w: int):
    """(C, N, 3) uint8 frames → (K_i8 (C·N, N) int8, rowsum (C·N, 1) f32).

    The round-3 quantized formulation: the UNNORMALIZED kernel
    k = exp(-½‖Δxy/α‖² − ½‖Δrgb/β‖²) lies in [0, 1) by construction
    (diagonal excluded), so it quantizes to int8 with the FIXED scale 127 —
    no per-row/per-tile scale arrays, ONE build sweep (vs two for bf16 M),
    and the iteration matvec reads 1 byte/element. The symmetric
    normalization n = 1/√(Σ k̂ + ε) is computed from the QUANTIZED rowsums,
    i.e. the mean-field runs the exactly-normalized 8-bit model rather than
    an 8-bit approximation of the f32 model (measured: segmentation
    agreement 1.0 with the f32 path on the synthetic corpus; an isolated
    pixel whose k-row underflows 1/254 now cleanly receives zero bilateral
    message and keeps its unary label).
    """
    c, n, _ = imgs_u8.shape
    tile = _pick_tile(n)
    if tile is None:
        raise ValueError(f"N={n} not a multiple of 128; use the XLA build")
    nt = n // tile

    from critic_vae_tpu.crf.device import _coords

    pos = _coords(h, w) / alpha
    posT = pos.T
    col = imgs_u8.astype(jnp.float32) / beta
    col_flat = col.reshape(c * n, 3)
    colT_flat = jnp.transpose(col, (2, 0, 1)).reshape(3, c * n)

    interp = jax.default_backend() != "tpu"
    k8, rowsum = pl.pallas_call(
        _build_i8_kernel,
        grid=(c, nt, nt),
        in_specs=[
            pl.BlockSpec((tile, 2), lambda ci, i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, tile), lambda ci, i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 3), lambda ci, i, j, nt=nt: (ci * nt + i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tile), lambda ci, i, j, nt=nt: (0, ci * nt + j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile, tile), lambda ci, i, j, nt=nt: (ci * nt + i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda ci, i, j, nt=nt: (ci * nt + i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((c * n, n), jnp.int8),
            jax.ShapeDtypeStruct((c * n, 1), jnp.float32),
        ],
        interpret=interp,
    )(pos, posT, col_flat, colT_flat)
    return k8, rowsum


def _matvec_i8_kernel(k_ref, y_ref, out_ref):
    out_ref[...] = jnp.dot(
        k_ref[...].astype(jnp.bfloat16), y_ref[...],
        preferred_element_type=jnp.float32,
    )


def matvec_i8(k8, y, *, n: int):
    """Batched (C·N, N)-blockwise matvec of the quantized kernel:
    out[f·N + i] = Σ_j K_i8[f·N + i, j] · y[f·N + j]  (f32 accumulate).

    ``y`` carries the folded normalizers, so the kernel itself is
    scale-free; int8 row-blocks convert to bf16 in-register — the MXU sees
    its native dtype and HBM sees 1 byte/element.

    Each program handles a FULL row block (rt, N) against the whole frame
    vector (n, L): 8 programs per 64×64 frame. Tile-square grids were
    measured grid-overhead-bound (4096 programs per 64-frame chunk
    iteration ran ~2.5× slower than the XLA bf16 matmul); the row-block
    shape keeps VMEM at rt·N int8 ≤ ~2 MB with rt chosen per resolution."""
    cn = k8.shape[0]
    c = cn // n
    L = y.shape[-1]
    # y rides as bf16: the (n, L) block is LANE-PADDED to 128 in VMEM/HBM
    # (measured: an f32[C·N, 2] block at 128x128 allocates 20 MB and OOMs
    # scoped vmem), and the kernel's dot consumes bf16 anyway
    y = y.astype(jnp.bfloat16)
    # row block: biggest that keeps the int8 block ≤ 2 MB (plus its bf16
    # copy ≤ 4 MB) comfortably under VMEM with double buffering
    rt = max(128, min(512, (2 * 1024 * 1024) // n // 128 * 128))
    while n % rt:
        rt //= 2
    nr = n // rt
    interp = jax.default_backend() != "tpu"
    return pl.pallas_call(
        _matvec_i8_kernel,
        grid=(c, nr),
        in_specs=[
            pl.BlockSpec((rt, n), lambda ci, i, nr=nr: (ci * nr + i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, L), lambda ci, i: (ci, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (rt, L), lambda ci, i, nr=nr: (ci * nr + i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((cn, L), jnp.float32),
        interpret=interp,
    )(k8, y)
