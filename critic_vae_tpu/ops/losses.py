"""VAE training losses (reference: vae_nets.py:53-62)."""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from critic_vae_tpu.ops.msssim import msssim_loss

KLD_WEIGHT = 1e-3  # vae_parameters.py:17


def kld_loss(mu: jnp.ndarray, logvar: jnp.ndarray) -> jnp.ndarray:
    """Mean-over-batch KL(q(z|x) ‖ N(0, I)) (reference: vae_nets.py:57)."""
    per_sample = -0.5 * jnp.sum(1.0 + logvar - mu**2 - jnp.exp(logvar), axis=1)
    return jnp.mean(per_sample)


def vae_loss(
    x: jnp.ndarray,
    mu: jnp.ndarray,
    logvar: jnp.ndarray,
    recon: jnp.ndarray,
    *,
    kld_weight: float = KLD_WEIGHT,
    faithful: bool = True,
) -> Dict[str, jnp.ndarray]:
    """Total = MS-SSIM(recon, x) + kld_weight · KLD (reference: vae_nets.py:53-62).

    Returns {'total_loss', 'recon_loss', 'kld'} as scalars.
    """
    recon_loss = msssim_loss(recon, x, faithful=faithful)
    kld = kld_loss(mu, logvar) * kld_weight
    return {
        "total_loss": recon_loss + kld,
        "recon_loss": recon_loss,
        "kld": kld,
    }
