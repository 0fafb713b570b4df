"""Critic-gradient saliency masks — a beyond-reference mask source.

The reference's only mask signal is the VAE reconstruction difference
(vae_utility.py:171-184): train a value-conditioned VAE, decode each frame
at the critic's value and at 0, and read the trunk out of |recon₁ − recon₀|.
Round-2/3 ablations measured that method's ceiling on the synthetic
distribution at thr-IoU ≈ 0.10–0.115 (docs/RESULTS.md) — the limiter is how
much the decoder leans on the injected value, not the mask machinery.

This module asks the critic *directly* where the evidence is: the per-pixel
input gradient |∂ pred / ∂ x|, channel-summed and Gaussian-smoothed, is a
saliency map from the same frozen critic the reference already ships — no
VAE, no training, one fused forward+backward per batch. Measured on the
550-frame held-out synthetic episode (docs/artifacts/saliency.json):
best-threshold IoU **0.268** (σ=1.5 smoothing; 0.231 raw), **0.277** after
the device CRF — ~2.4× the recon-difference method's ceiling, with the
same thresholds/normalization/CRF/bin machinery downstream.

Opt-in refinements push to **0.475 / 0.501 with CRF (~4.6×/4.8×)**, each
measured separately (same artifact): logit-space gradients (``logits=True``
— probability gradients carry a σ′ factor that vanishes exactly on the
confident frames; alone 0.268 → 0.328), SmoothGrad averaging
(``samples=8, noise=0.08`` — |grad| averaged over noisy input copies,
integrating the gradient over a neighborhood; on logits → 0.469), and
lighter smoothing (``smooth_sigma=1.0`` — the averaging already denoises;
plateau σ=0.75–1.0, → 0.475, seed-robust). Cost is exactly samples× the
gradient stage (~8× fewer f/s at n=8 on the chip; absolute rates vary
~25% run-to-run with tunnel dispatch jitter — docs/DESIGN.md).

TPU notes: the critic is 11,873 params, so the VJP is one cheap fused
program; the smoothing is an exactly-separable truncated Gaussian (two
depthwise 1-D convs, same construction as the CRF's spatial kernel,
crf/device.py). Edge handling replicates the border pixel (matches
scipy's "nearest"; zero padding would damp saliency at frame borders
where trunks are routinely cut off).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from critic_vae_tpu.models.critic import critic_apply

DEFAULT_SMOOTH_SIGMA = 1.5  # best of the measured {1.0, 1.5, 2.0} sweep


def gaussian_taps(sigma: float) -> np.ndarray:
    """Normalized 1-D Gaussian taps truncated at 4σ (scipy's default)."""
    radius = max(1, int(4.0 * sigma + 0.5))
    k = np.arange(-radius, radius + 1, dtype=np.float32)
    taps = np.exp(-0.5 * (k / np.float32(sigma)) ** 2)
    return (taps / taps.sum()).astype(np.float32)


def _sep_blur(x: jnp.ndarray, taps: jnp.ndarray) -> jnp.ndarray:
    """Separable 2-D blur of (B, H, W) maps with edge-replicate padding."""
    r = taps.shape[0] // 2
    x = jnp.pad(x, ((0, 0), (r, r), (r, r)), mode="edge")[..., None]
    dn = ("NHWC", "HWIO", "NHWC")
    # HIGHEST: the MXU's default bf16 operand rounding would break the
    # tested scipy parity on the real chip (CLAUDE.md); the taps are a
    # handful of multiplies per pixel, so exactness here is free
    hi = jax.lax.Precision.HIGHEST
    x = jax.lax.conv_general_dilated(
        x, taps.reshape(-1, 1, 1, 1), (1, 1), "VALID", dimension_numbers=dn,
        precision=hi,
    )
    x = jax.lax.conv_general_dilated(
        x, taps.reshape(1, -1, 1, 1), (1, 1), "VALID", dimension_numbers=dn,
        precision=hi,
    )
    return x[..., 0]


def critic_saliency(
    critic_params,
    x: jnp.ndarray,
    *,
    smooth_sigma: float = DEFAULT_SMOOTH_SIGMA,
    logits: bool = False,
    samples: int = 1,
    noise: float = 0.0,
    key=None,
):
    """Saliency maps + predictions for a batch of frames, one fused program.

    Args:
      x: (B, 64, 64, 3) float frames in [0, 1], NHWC (critic input contract,
        models/critic.py).
      smooth_sigma: Gaussian smoothing σ in pixels; 0 disables smoothing.
      logits: differentiate the pre-sigmoid logit instead of the probability.
        Probability gradients vanish where the critic saturates (σ'(z) → 0
        exactly on the confident frames that carry the strongest evidence);
        logit gradients don't. Returned ``preds`` are ALWAYS probabilities
        regardless (downstream value injection / bin info contract).
      samples / noise / key: SmoothGrad (Smilkov et al. 2017,
        arXiv:1706.03825): average |grad| over ``samples`` copies of ``x``
        perturbed with N(0, noise²) pixel noise drawn from ``key``. The
        averaging integrates the gradient over a small input neighborhood,
        suppressing the single-point gradient's speckle. ``noise == 0``
        (default) is the deterministic single-VJP path regardless of
        ``samples`` — zero-noise copies are identical, so the average is
        computed once rather than ``samples`` times. ``key`` is required
        when ``noise > 0``. Measured best on the
        synthetic benchmark: ``logits=True, samples=8, noise=0.08,
        smooth_sigma=1.0`` → best-threshold IoU 0.475 / 0.501 with CRF,
        vs 0.268 / 0.276 deterministic (docs/artifacts/saliency.json).

    Returns:
      (preds (B,), saliency (B, H, W) float32): ``preds`` are the critic
      probabilities on the CLEAN input (identical to
      ``critic_apply(params, x)[:, 0]``) and ``saliency`` is |∂ score / ∂ x|
      summed over RGB, sample-averaged, smoothed. Per-image gradients come
      from one batched VJP — predictions are independent across the batch,
      so pulling back a ones-vector yields each image's own gradient.
    """
    if samples < 1:
        raise ValueError(
            f"critic_saliency: samples must be >= 1, got {samples} "
            "(0 would average over an empty axis and yield all-NaN maps)"
        )
    if noise < 0.0:
        raise ValueError(f"critic_saliency: noise must be >= 0, got {noise}")

    def score(xb):
        return critic_apply(critic_params, xb, return_logits=logits)[:, 0]

    def grad_abs(xb):
        s, vjp = jax.vjp(score, xb)
        (g,) = vjp(jnp.ones_like(s))
        return s, jnp.abs(g).sum(-1)

    if noise > 0.0:
        if key is None:
            raise ValueError("critic_saliency: SmoothGrad (noise>0) "
                             "requires a PRNG key")

        def one(k):
            return grad_abs(x + noise * jax.random.normal(k, x.shape, x.dtype))[1]

        sal = jnp.mean(jax.vmap(one)(jax.random.split(key, samples)), 0)
        preds = score(x)
    else:
        # noise == 0: every SmoothGrad copy would be identical — one VJP
        # gives the exact same average at 1/samples the cost
        preds, sal = grad_abs(x)
    if logits:
        preds = jax.nn.sigmoid(preds)
    if smooth_sigma and smooth_sigma > 0:
        sal = _sep_blur(sal, jnp.asarray(gaussian_taps(smooth_sigma)))
    return preds, sal.astype(jnp.float32)
