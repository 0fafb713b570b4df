"""Fused SAME-conv + maxpool2 via phase packing (TPU MXU-layout optimization).

The encoder interleaves K×K stride-1 SAME convs with 2×2 max-pools
(reference: vae_nets.py:68-88 — conv5×5, BN, maxpool, ReLU; the critic's
blocks are conv3×3, ReLU, maxpool, critic_net.py:15-29). Computed literally,
each conv writes its FULL-resolution output to HBM just for the pool to read
it back and discard 3/4 of it — and, worse for the MXU, the early convs have
tiny output-channel counts (32, 64 for the VAE; 8 for the critic) that fill
only a fraction of the MXU's 128 lanes, which is exactly where the round-3
profile showed the serving pipeline losing its time (encoder at 37% MFU,
docs/DESIGN.md round-4 probe).

The trick is the encoder-side mirror of the decoder's phase-decomposed
upsample+conv (ops/upconv.py): the four pool candidates

    y[2i+a, 2j+b, c],  (a, b) ∈ {0,1}²

of a K×K SAME conv are together one stride-2 conv with a (K+1)×(K+1) kernel
and 4·C_out output channels — phase (a, b)'s K×K kernel embedded at offset
(a, b), zero elsewhere:

    y[2i+a + dy−p] = x[(2i−p) + t]·w[t−a]   with t = a+dy ∈ {a, …, a+K−1}

so one conv(K+1, stride 2, pad (p, p)) with packed kernel
``w6[t_y, t_x, :, (2a+b)·C + c] = w[t_y−a, t_x−b, :, c]`` produces all four
phase tensors at once; ``max`` over the phase groups IS the maxpool. Same
MACs land on a GEMM with N = 4·C_out (full MXU lanes for C_out ≥ 32) and
M shrunk 4×, the full-resolution tensor never exists in HBM, and the
(K+1)²/K² zero-tap overhead (1.44× for K=5, 1.78× for K=3) is paid in the
MXU's previously-idle lanes.

Exactness: the four phase tensors are literally the pool's candidate set,
so ``max`` over them equals the reference pool for ANY per-channel affine
(BatchNorm) applied per-phase before the max — no monotonicity argument
needed, negative BN scales included. Covered by tests/test_poolconv.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pack_pool_phases(w: jnp.ndarray) -> jnp.ndarray:
    """(K, K, Cin, Cout) → ((K+1), (K+1), Cin, 4·Cout) phase-packed kernel.

    Output channel layout is phase-major: channel ``(2a+b)·Cout + c`` holds
    phase (a, b) of original channel ``c`` (so a reshape to (…, 4, Cout)
    splits phases out).
    """
    k = w.shape[0]
    assert w.shape[1] == k, "square kernels only"
    phases = [
        jnp.pad(w, ((a, 1 - a), (b, 1 - b), (0, 0), (0, 0)))
        for a in (0, 1)
        for b in (0, 1)
    ]
    return jnp.concatenate(phases, axis=-1)  # (K+1, K+1, Cin, 4·Cout)


def conv_pool2_phases(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """All four pool candidates of ``maxpool2(convKxK_SAME(x, w))`` in one
    stride-2 conv.

    Args:
      x: (B, H, W, Cin) NHWC, H and W even.
      w: (K, K, Cin, Cout) HWIO, K odd (SAME padding p = (K−1)//2).

    Returns:
      (B, H/2, W/2, 4, Cout) pre-bias phase tensors;
      ``out.max(axis=3) + bias`` equals
      ``maxpool2(conv_same(x, w) + bias)`` exactly (up to GEMM-order
      reassociation), and any per-channel affine applied to the phase
      tensor before the max commutes with the reference's
      conv→affine→pool order.
    """
    k = w.shape[0]
    p = (k - 1) // 2
    w6 = pack_pool_phases(w.astype(x.dtype))
    y = jax.lax.conv_general_dilated(
        x, w6, window_strides=(2, 2), padding=((p, p), (p, p)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    b, h2, w2, _ = y.shape
    return y.reshape(b, h2, w2, 4, w.shape[-1])


def conv_pool2_max(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """``maxpool2(conv_same(x, w) + b)`` fused (bias added post-max — it is
    per-channel constant across the candidate set, so it commutes)."""
    return conv_pool2_phases(x, w).max(axis=3) + b.astype(x.dtype)


# ---------------------------------------------------------------------------
# space-to-depth first-block formulation
# ---------------------------------------------------------------------------
#
# The round-4 per-block profile (docs/DESIGN.md) found BOTH first-layer convs
# — the VAE encoder's 5×5 3→32 and the critic's 3×3 3→8, each over
# (B, 64, 64, 3) — running at ~5% MFU and together costing ~3.2 ms of the
# 7.0 ms pipeline: a 3-channel input leaves the MXU's 128 lanes almost
# empty and XLA's implicit-GEMM conv has no good tiling for it. The classic
# TPU remedy (space-to-depth, as used in the public TPU ResNet/MaskRCNN
# pipelines) composes exactly with the phase packing above:
#
#   conv K×K stride 1 + maxpool2
#     ≡ one (K+1)×(K+1) stride-2 conv with 4·C_out phase channels   (above)
#     ≡ one 3×3 STRIDE-1 conv on the 2×2 space-to-depth input       (here)
#
# because a ≤6-tap window read at even offsets is a 3-block window over 2×2
# pixel blocks: with t = 2u+p, s = 2v+q,
#
#   w3[u, v, (p, q, cin), cout'] = w6[2u+p, 2v+q, cin, cout'].
#
# The input becomes (B, 34, 34, 12) (pad 2 = one whole block per side) and
# the GEMM becomes M = B·H/2·W/2, K = 9·4·Cin, N = 4·C_out — full MXU
# shapes. For K=3 kernels the 4×4 stride-2 window sits at base offset 1, so
# it embeds at (1, 1) inside the 6×6 zero kernel first.


def _embed6(w_packed: jnp.ndarray, k: int) -> jnp.ndarray:
    """Embed a packed (K+1)×(K+1) phase kernel into the 6×6 window whose
    base offset is 2i−2 (pad 2). K=5 → identity; K=3 → offset (1, 1)."""
    if k == 5:
        return w_packed
    if k == 3:
        return jnp.pad(w_packed, ((1, 1), (1, 1), (0, 0), (0, 0)))
    raise ValueError(f"s2d pool-conv supports K in (3, 5), got {k}")


def space_to_depth2(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) → (B, H/2, W/2, 4C); block layout (p, q, c) matches
    :func:`s2d_pool_weights`."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def s2d_pool_weights(w: jnp.ndarray) -> jnp.ndarray:
    """(K, K, Cin, Cout) → (3, 3, 4·Cin, 4·Cout) space-to-depth phase kernel."""
    k = w.shape[0]
    w6 = _embed6(pack_pool_phases(w), k)  # (6, 6, Cin, 4·Cout)
    cin, cout4 = w6.shape[2], w6.shape[3]
    # w3[u, v, (p, q, cin)] = w6[2u+p, 2v+q, cin]
    w3 = w6.reshape(3, 2, 3, 2, cin, cout4)  # (u, p, v, q, cin, cout')
    return w3.transpose(0, 2, 1, 3, 4, 5).reshape(3, 3, 4 * cin, cout4)


def s2d_conv_pool2_phases(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Same contract as :func:`conv_pool2_phases` — all four pool candidates
    of ``maxpool2(convKxK_SAME(x, w))`` — but computed as one 3×3 stride-1
    conv over the 2×2 space-to-depth input (see module notes: the MXU-shaped
    formulation for 3-channel inputs).

    Returns (B, H/2, W/2, 4, Cout) pre-bias phase tensors.
    """
    w3 = s2d_pool_weights(w.astype(x.dtype))
    xp = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)))
    xs = space_to_depth2(xp)  # (B, H/2+2, W/2+2, 4·Cin)
    y = jax.lax.conv_general_dilated(
        xs, w3, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    b, h2, w2, _ = y.shape
    return y.reshape(b, h2, w2, 4, w.shape[-1])
