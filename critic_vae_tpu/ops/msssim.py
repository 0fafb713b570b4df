"""MS-SSIM reconstruction loss, NHWC, jit-friendly.

Reproduces the reference's MSSIM module (reference: vae_nets.py:150-247)
including its **two load-bearing quirks**, both verified numerically against
the torch implementation — an innocently "corrected" MS-SSIM would silently
change the training objective (SURVEY §2.1 #7):

1. The "gaussian" window is missing the minus sign in the exponent
   (vae_nets.py:171): ``exp(+(x-5)²/(2σ²))`` normalized — an *edge-weighted*
   kernel ``[0.424, 0.057, …, 0.057, 0.424]``, not a Gaussian.
2. The multi-scale combination is ``prod(pow1[:-1] * pow2[-1])``
   (vae_nets.py:246): the last-scale SSIM enters the product broadcast over
   all four contrast terms, i.e. at 4× its weight, instead of the standard
   ``prod(mcs[:-1]^w[:-1]) · mssim[-1]^w[-1]``.

Pass ``faithful=False`` for the textbook formulation (proper Gaussian window
and standard combination).

TPU-first: the 11×11 window is an outer product of a 1-D kernel, so each
windowed mean is computed as two *separable* depthwise convolutions
(11+11 taps instead of 121) — a ~5.5× FLOP reduction on the hottest op in the
training step; all five windowed stats per scale share the same kernel and
XLA fuses the elementwise epilogue.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

WINDOW_SIZE = 11
SIGMA = 1.5
WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


@functools.cache
def window_1d(faithful: bool = True, window_size: int = WINDOW_SIZE, sigma: float = SIGMA) -> np.ndarray:
    """1-D window kernel. ``faithful=True`` keeps the sign bug (vae_nets.py:171)."""
    x = np.arange(window_size, dtype=np.float64) - window_size // 2
    sign = 1.0 if faithful else -1.0
    k = np.exp(sign * x**2 / (2.0 * sigma**2))
    return (k / k.sum()).astype(np.float32)


def _depthwise_sep_conv(x: jnp.ndarray, k1d: jnp.ndarray) -> jnp.ndarray:
    """Separable depthwise 2-D window conv, SAME padding (zero-pad, matching
    torch F.conv2d's implicit zero padding at vae_nets.py:190)."""
    c = x.shape[-1]
    kh = jnp.tile(k1d.reshape(-1, 1, 1, 1), (1, 1, 1, c))  # (K,1,1,C)
    kw = jnp.tile(k1d.reshape(1, -1, 1, 1), (1, 1, 1, c))  # (1,K,1,C)
    dn = ("NHWC", "HWIO", "NHWC")
    y = jax.lax.conv_general_dilated(
        x, kh.astype(x.dtype), (1, 1), "SAME", dimension_numbers=dn,
        feature_group_count=c,
    )
    return jax.lax.conv_general_dilated(
        y, kw.astype(x.dtype), (1, 1), "SAME", dimension_numbers=dn,
        feature_group_count=c,
    )


def _avg_pool2(x: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    ) * 0.25


def _ssim_level(
    img1: jnp.ndarray, img2: jnp.ndarray, k1d: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One scale of SSIM (reference: vae_nets.py:181-215). Returns (ssim, cs),
    each a scalar mean over the whole batch (size_average=True path)."""
    conv = functools.partial(_depthwise_sep_conv, k1d=k1d)
    mu1, mu2 = conv(img1), conv(img2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = conv(img1 * img1) - mu1_sq
    sigma2_sq = conv(img2 * img2) - mu2_sq
    sigma12 = conv(img1 * img2) - mu1_mu2

    c1 = 0.01**2  # img_range fixed at 1.0 (vae_nets.py:201)
    c2 = 0.03**2
    v1 = 2.0 * sigma12 + c2
    v2 = sigma1_sq + sigma2_sq + c2
    cs = jnp.mean(v1 / v2)
    ssim_map = ((2.0 * mu1_mu2 + c1) * v1) / ((mu1_sq + mu2_sq + c1) * v2)
    return jnp.mean(ssim_map), cs


def msssim_loss(
    img1: jnp.ndarray, img2: jnp.ndarray, *, faithful: bool = True,
    clamp: bool = True,
) -> jnp.ndarray:
    """1 − MS-SSIM over 5 scales (reference: vae_nets.py:217-247).

    Args:
      img1, img2: (B, H, W, C) images; the reference calls this with
        (recon, x) — order is irrelevant since img_range is fixed.
      faithful: replicate both reference quirks (default). ``False`` computes
        standard MS-SSIM (proper Gaussian, standard weighting).
      clamp: floor the per-scale SSIM/CS values at a tiny positive epsilon
        before the fractional powers. SSIM and CS can go negative early in
        training, where ``x**0.28`` is NaN — the reference's torch code has
        the same hazard (vae_nets.py:243-244) and simply diverges when hit
        (observed: a full training run poisoned to NaN params). The clamp
        only changes values in the regime where the reference objective is
        NaN, so parity holds everywhere the reference itself survives.
    """
    k1d = jnp.asarray(window_1d(faithful))
    weights = jnp.asarray(WEIGHTS, img1.dtype)
    mssim, mcs = [], []
    for _ in range(len(WEIGHTS)):
        sim, cs = _ssim_level(img1, img2, k1d)
        mssim.append(sim)
        mcs.append(cs)
        img1, img2 = _avg_pool2(img1), _avg_pool2(img2)
    mssim = jnp.stack(mssim)
    mcs = jnp.stack(mcs)
    if clamp:
        # straight-through floor: forward value is max(x, eps) so the
        # fractional powers stay finite, but the gradient is the identity —
        # a hard clamp would zero the gradient in the clamped regime and
        # strand training at loss ≈ 1 with no recovery signal (observed)
        eps = jnp.asarray(1e-4, mssim.dtype)

        def st_floor(x):
            return x + jax.lax.stop_gradient(jnp.maximum(x, eps) - x)

        mssim = st_floor(mssim)
        mcs = st_floor(mcs)

    pow1 = mcs**weights
    pow2 = mssim**weights
    if faithful:
        # quirk (2): last-scale SSIM broadcast into a 4-element product
        output = jnp.prod(pow1[:-1] * pow2[-1])
    else:
        output = jnp.prod(pow1[:-1]) * pow2[-1]
    return 1.0 - output
