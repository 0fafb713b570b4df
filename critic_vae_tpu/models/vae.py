"""Critic-conditioned VAE as pure JAX functions (TPU-native, NHWC).

Capability parity with the reference model (reference: vae_nets.py:7-147):

* **Encoder** — 4×[conv5×5 s1 SAME → BatchNorm → maxpool2 → ReLU], channel
  dims (32, 64, 128, 256), last block Tanh instead of ReLU
  (vae_nets.py:68-88); flatten to 4096, then fc_mu / fc_var to a 32-d latent
  (vae_nets.py:98-99).
* **Reparameterization** — z = mu + eps·exp(0.5·logvar) (vae_nets.py:48-51).
* **Decoder** — the *critic value is concatenated onto the latent*
  (vae_nets.py:137,143): Linear(33→4096), reshape to a 4×4×256 feature map,
  4×[conv5×5 → ReLU → 2× nearest-neighbor upsample], final conv to 3 channels
  + Tanh (vae_nets.py:116-135).

TPU-first design choices (not a translation):

* NHWC activations / HWIO weights throughout; torch checkpoints are
  transposed once at ingestion (:func:`vae_params_from_torch`).
* Everything is batched — the reference's `evaluate`/`inject` paths
  special-case batch size 1 (vae_nets.py:140-142); here `decode` is
  shape-polymorphic and the pipelines drive it with thousands of frames.
* BatchNorm is functional: batch statistics are returned as a new state
  pytree instead of mutated in place. Under data parallelism the batch axis
  is sharded over the mesh and ``jnp.mean`` over it compiles to an XLA
  cross-replica reduction, so BN statistics are *global* batch statistics —
  exactly matching single-device semantics (documented choice, SURVEY §7f).
* The flatten between conv stack and fc layers uses channel-major element
  order (transpose to (B, C, H, W) before reshape) so that torch fc weights
  ingest without reindexing; XLA folds the transpose into the matmul.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]
State = Dict[str, Any]

ENCODER_DIMS = (32, 64, 128, 256)
LATENT_DIM = 32
BOTTLENECK = 4096
_BN_EPS = 1e-5
_BN_MOMENTUM = 0.1


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _uniform(key, shape, bound, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def _init_conv(key, kh, kw, cin, cout):
    wkey, bkey = jax.random.split(key)
    bound = 1.0 / np.sqrt(cin * kh * kw)
    return {
        "w": _uniform(wkey, (kh, kw, cin, cout), bound),
        "b": _uniform(bkey, (cout,), bound),
    }


def _init_linear(key, cin, cout):
    wkey, bkey = jax.random.split(key)
    bound = 1.0 / np.sqrt(cin)
    return {
        "w": _uniform(wkey, (cin, cout), bound),
        "b": _uniform(bkey, (cout,), bound),
    }


def init_vae_params(
    key: jax.Array, dims: Tuple[int, ...] = ENCODER_DIMS, channels: int = 3,
    latent_dim: int = LATENT_DIM, bottleneck: int = BOTTLENECK,
    film: bool = False,
) -> Tuple[Params, State]:
    """Initialize VAE params + BN state (weight dists match torch defaults).

    ``film=True`` adds the opt-in multi-stage value-conditioning pathway
    (round 3, beyond the reference): a zero-initialized linear per decoder
    stage mapping the scalar critic value to per-channel (gamma, beta)
    FiLM modulation, applied pre-ReLU after decoder convs 0-3. Zero init
    makes the film model *exactly* the baseline at step 0; the pathway is
    purely learned. The reference's only conditioning is the one scalar
    concatenated onto the 32-d latent (vae_nets.py:137,143) — the round-2
    ablations isolated that bottleneck as the mask-quality limiter
    (docs/RESULTS.md)."""
    keys = jax.random.split(key, 16)
    enc: Params = {}
    cin = channels
    for i, cout in enumerate(dims):
        enc[f"conv{i}"] = _init_conv(keys[i], 5, 5, cin, cout)
        enc[f"bn{i}"] = {
            "scale": jnp.ones((cout,), jnp.float32),
            "bias": jnp.zeros((cout,), jnp.float32),
        }
        cin = cout
    enc["fc_mu"] = _init_linear(keys[4], bottleneck, latent_dim)
    enc["fc_var"] = _init_linear(keys[5], bottleneck, latent_dim)

    dec: Params = {"input": _init_linear(keys[6], latent_dim + 1, bottleneck)}
    dec_dims = [(dims[3], dims[2]), (dims[2], dims[1]), (dims[1], dims[0]),
                (dims[0], dims[0]), (dims[0], channels)]
    for i, (ci, co) in enumerate(dec_dims):
        dec[f"conv{i}"] = _init_conv(keys[7 + i], 5, 5, ci, co)
    if film:
        for i, (_, co) in enumerate(dec_dims[:4]):
            dec[f"film{i}"] = {
                "w": jnp.zeros((1, 2 * co), jnp.float32),
                "b": jnp.zeros((2 * co,), jnp.float32),
            }

    state: State = {
        f"bn{i}": {
            "mean": jnp.zeros((c,), jnp.float32),
            "var": jnp.ones((c,), jnp.float32),
        }
        for i, c in enumerate(dims)
    }
    return {"encoder": enc, "decoder": dec}, state


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------


def _conv5_same(x, w, b):
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + b.astype(x.dtype)


def _maxpool2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


def _maxpool2_strided(x):
    """maxpool2 as three elementwise maxima over strided slices — exactly the
    same candidate set as reduce_window; XLA fuses the slices+max chain
    differently (serving A/B, docs/DESIGN.md round 4)."""
    return jnp.maximum(
        jnp.maximum(x[:, ::2, ::2], x[:, ::2, 1::2]),
        jnp.maximum(x[:, 1::2, ::2], x[:, 1::2, 1::2]),
    )


def _batchnorm(x, p, s, train: bool):
    """Functional BatchNorm2d; stats in float32. Returns (y, new_running)."""
    if train:
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(0, 1, 2))
        var = jnp.var(xf, axis=(0, 1, 2))
        n = x.shape[0] * x.shape[1] * x.shape[2]
        unbiased = var * (n / max(n - 1, 1))
        new_running = {
            "mean": (1 - _BN_MOMENTUM) * s["mean"] + _BN_MOMENTUM * mean,
            "var": (1 - _BN_MOMENTUM) * s["var"] + _BN_MOMENTUM * unbiased,
        }
    else:
        mean, var = s["mean"], s["var"]
        new_running = s
    inv = jax.lax.rsqrt(var + _BN_EPS) * p["scale"]
    y = (x.astype(jnp.float32) - mean) * inv + p["bias"]
    return y.astype(x.dtype), new_running


# Per-block fused conv+pool serving config (ops/poolconv.py);
# `encode(fused_pool=True)` resolves to this. Per-block values:
#   False — the plain conv→BN→pool graph;
#   True  — phase-packed stride-2 conv (conv_pool2_phases). MEASURED
#           NEGATIVE everywhere on the v5e chip (round 4, docs/DESIGN.md:
#           encoder 3.87 → 3.99–4.76 ms): XLA already tiles mid-stack convs
#           well, so the (K+1)²/K² zero-tap overhead never pays. Kept as a
#           validated opt-in.
#   "s2d" — space-to-depth + 3×3 phase conv (s2d_conv_pool2_phases): the
#           MXU-shaped formulation for the 3-CHANNEL INPUT block, which the
#           round-4 per-block profile caught running at ~5% MFU (1.70 of
#           the encoder's 3.87 ms).
FUSED_POOL_SERVING: Tuple = ("s2d", False, False, False)


def encode(
    params: Params, state: State, x: jnp.ndarray, *, train: bool = False,
    fused_pool: bool | Tuple[bool, bool, bool, bool] = False,
    fold_bn: bool = False, pool_impl: str = "reduce_window",
    block0_f32: bool = False, start_block: int = 0,
    downstream_dtype=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, State]:
    """x (B,64,64,3) → (mu, logvar) each (B,32), plus updated BN state.

    Serving-path options (eval-mode only, exact up to float reassociation):

    ``fused_pool``: run selected conv+BN+maxpool blocks through the
    phase-packed stride-2 formulation (ops/poolconv.py) — same candidate
    set, BN applied per-phase pre-max. ``True`` = FUSED_POOL_SERVING; a
    4-tuple selects per block. Measured NEGATIVE on v5e (see
    FUSED_POOL_SERVING note); kept as a validated opt-in.

    ``fold_bn``: fold the eval-mode BatchNorm affine into the conv weights
    (w' = w·k, b' = (b − mean)·k + β with k = γ·rsqrt(var+ε)) — the BN
    pass over the full-resolution conv output disappears entirely.
    Algebraically identical; bf16 weight rounding applies to w·k instead
    of w.

    ``pool_impl``: "reduce_window" (default) or "strided" (three
    elementwise maxima over strided slices — same candidate set).

    ``block0_f32``: run the FIRST conv (just the conv — its output casts
    straight back to the compute dtype inside the conv epilogue, so the
    BN/pool traffic stays bf16) in float32 even when x is bf16. Measured
    FASTER on the v5e chip — XLA's bf16 conv path handles the 3-channel
    64×64 input badly (1.59 ms bf16 vs 1.13 ms f32 for the conv alone,
    round-4 calibration probe; the first cut that upcast the WHOLE block
    measured 4.65 ms — f32 pool bytes ate the conv win) — and strictly
    more precise. Pass x ALREADY f32 with ``downstream_dtype`` set to the
    bf16 compute dtype to avoid any input cast copy (a materialized f32
    input copy cancels the win — measured 6.89 vs 6.83 ms full-pipeline).

    ``downstream_dtype``: dtype for blocks after block 0 (default x.dtype).
    """
    if fused_pool is True:
        fused_pool = FUSED_POOL_SERVING
    elif fused_pool is False:
        fused_pool = (False, False, False, False)
    if train and (any(fused_pool) or fold_bn):
        raise ValueError("encode: fused_pool/fold_bn are eval-mode serving paths")
    if pool_impl not in ("reduce_window", "strided"):
        raise ValueError(f"unknown pool_impl {pool_impl!r}")
    pool = _maxpool2 if pool_impl == "reduce_window" else _maxpool2_strided
    enc = params["encoder"]
    new_state: State = {}
    out_dtype = jnp.dtype(downstream_dtype) if downstream_dtype is not None else x.dtype
    # start_block > 0: x is the post-activation output of block
    # start_block-1 (serving fusion entry — ops/mask.py merged front-end
    # computes block 0 jointly with the critic's); the skipped blocks'
    # running stats pass through untouched.
    for i in range(start_block):
        new_state[f"bn{i}"] = state[f"bn{i}"]
    for i in range(start_block, 4):
        if fused_pool[i]:
            from critic_vae_tpu.ops.poolconv import (
                conv_pool2_phases,
                s2d_conv_pool2_phases,
            )

            phase_conv = (
                s2d_conv_pool2_phases if fused_pool[i] == "s2d"
                else conv_pool2_phases
            )
            y = phase_conv(x, enc[f"conv{i}"]["w"].astype(x.dtype))
            y = y + enc[f"conv{i}"]["b"].astype(x.dtype)
            y, new_state[f"bn{i}"] = _batchnorm(
                y, enc[f"bn{i}"], state[f"bn{i}"], False
            )
            x = jnp.max(y, axis=3)
        elif fold_bn:
            k = jax.lax.rsqrt(state[f"bn{i}"]["var"] + _BN_EPS) * enc[f"bn{i}"]["scale"]
            w = enc[f"conv{i}"]["w"] * k  # (5,5,Cin,Cout)·(Cout,) in f32
            b = (enc[f"conv{i}"]["b"] - state[f"bn{i}"]["mean"]) * k + enc[f"bn{i}"]["bias"]
            x = pool(_conv5_same(x, w, b))
            new_state[f"bn{i}"] = state[f"bn{i}"]
        else:
            xin = x.astype(jnp.float32) if (block0_f32 and i == 0) else x
            x = _conv5_same(xin, enc[f"conv{i}"]["w"], enc[f"conv{i}"]["b"])
            if block0_f32 and i == 0:
                x = x.astype(out_dtype)
            x, new_state[f"bn{i}"] = _batchnorm(x, enc[f"bn{i}"], state[f"bn{i}"], train)
            x = pool(x)
        x = jnp.tanh(x) if i == 3 else jax.nn.relu(x)
    # channel-major flatten for torch fc-weight layout compatibility
    flat = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)
    mu = flat @ enc["fc_mu"]["w"].astype(flat.dtype) + enc["fc_mu"]["b"].astype(flat.dtype)
    logvar = flat @ enc["fc_var"]["w"].astype(flat.dtype) + enc["fc_var"]["b"].astype(flat.dtype)
    return mu, logvar, new_state


def reparametrize(key: jax.Array, mu: jnp.ndarray, logvar: jnp.ndarray) -> jnp.ndarray:
    """z = mu + eps·std (reference: vae_nets.py:48-51)."""
    std = jnp.exp(0.5 * logvar)
    eps = jax.random.normal(key, mu.shape, mu.dtype)
    return mu + eps * std


def _film(x, p, value):
    """Per-channel FiLM modulation from the scalar value (pre-activation):
    ``x·(1 + gamma) + beta`` with (gamma, beta) = Linear(value). Zero-init
    params make this the identity (see :func:`init_vae_params` film=True)."""
    gb = value.astype(jnp.float32) @ p["w"] + p["b"]  # (B, 2C)
    gamma, beta = jnp.split(gb.astype(x.dtype), 2, axis=1)
    return x * (1 + gamma[:, None, None, :]) + beta[:, None, None, :]


def decode(
    params: Params, z: jnp.ndarray, value: jnp.ndarray, *, fused: bool = True,
    apply_tanh: bool = True,
) -> jnp.ndarray:
    """Decode latents with injected critic values.

    Args:
      params: full VAE param pytree.
      z: (B, 32) latents.
      value: (B,) or (B, 1) critic values, concatenated onto the latent
        (the defining trick of the reference — vae_nets.py:143). When the
        decoder carries ``film{i}`` params (opt-in, init_vae_params
        film=True), the value additionally FiLM-modulates each decoder
        stage pre-ReLU.
      fused: use the phase-decomposed upsample+conv path (2.1× fewer decoder
        FLOPs, no upsampled tensors in HBM — ops/upconv.py). Numerically
        equal to the literal repeat-then-conv graph up to f32 reassociation.

    Returns:
      (B, 64, 64, 3) reconstructions in (-1, 1) (final Tanh).
    """
    from critic_vae_tpu.ops.upconv import upsample2_conv5

    dec = params["decoder"]
    if value.ndim == 1:
        value = value[:, None]
    zin = jnp.concatenate([z, value.astype(z.dtype)], axis=1)  # (B, 33)
    h = zin @ dec["input"]["w"].astype(z.dtype) + dec["input"]["b"].astype(z.dtype)
    # channel-major unflatten, then to NHWC (torch views 4096 as (256,4,4));
    # channels/spatial derive from the params so non-default configurations
    # (init_vae_params dims/bottleneck) error loudly instead of reshaping
    # into shape-valid garbage
    c_in = dec["conv0"]["w"].shape[2]
    spatial = int(round((h.shape[-1] / c_in) ** 0.5))
    if spatial * spatial * c_in != h.shape[-1]:
        raise ValueError(
            f"decoder bottleneck {h.shape[-1]} does not factor into "
            f"(C={c_in}) x S x S"
        )
    x = h.reshape(h.shape[0], c_in, spatial, spatial).transpose(0, 2, 3, 1)
    # Reference graph: 4×[conv5×5 → ReLU → nearest ×2] → conv5×5 → Tanh
    # (vae_nets.py:116-135). ReLU commutes with nearest-upsampling, so each
    # upsample→conv pair fuses into 4 small phase convs.
    if fused:
        x = _conv5_same(x, dec["conv0"]["w"], dec["conv0"]["b"])
        if "film0" in dec:
            x = _film(x, dec["film0"], value)
        x = jax.nn.relu(x)
        for i in (1, 2, 3):
            x = upsample2_conv5(x, dec[f"conv{i}"]["w"], dec[f"conv{i}"]["b"])
            if f"film{i}" in dec:
                x = _film(x, dec[f"film{i}"], value)
            x = jax.nn.relu(x)
        x = upsample2_conv5(x, dec["conv4"]["w"], dec["conv4"]["b"])
        return jnp.tanh(x) if apply_tanh else x
    for i in range(4):
        x = _conv5_same(x, dec[f"conv{i}"]["w"], dec[f"conv{i}"]["b"])
        if f"film{i}" in dec:
            x = _film(x, dec[f"film{i}"], value)
        x = jax.nn.relu(x)
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)  # nearest ×2
    x = _conv5_same(x, dec["conv4"]["w"], dec["conv4"]["b"])
    return jnp.tanh(x) if apply_tanh else x


def vae_apply(
    params: Params, state: State, key: jax.Array, x: jnp.ndarray,
    value: jnp.ndarray, *, train: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, State]:
    """Full stochastic forward pass (reference: vae_nets.py:14-19).

    Returns (recon, mu, logvar, new_state).
    """
    mu, logvar, new_state = encode(params, state, x, train=train)
    z = reparametrize(key, mu, logvar)
    recon = decode(params, z, value)
    return recon, mu, logvar, new_state


def evaluate(params: Params, state: State, x: jnp.ndarray, value: jnp.ndarray) -> jnp.ndarray:
    """Deterministic mu-decode (reference: vae_nets.py:42-46), batched."""
    mu, _, _ = encode(params, state, x, train=False)
    return decode(params, mu, value)


def recon_samples(
    params: Params, state: State, key: jax.Array, x: jnp.ndarray,
    value: jnp.ndarray, n_samples: int = 6,
) -> jnp.ndarray:
    """n stochastic reconstructions of each frame at a fixed injected value.

    API parity with the reference's (unused) ``recon_samples``
    (vae_nets.py:21-29), which loops 6 reparametrize+decode calls; here all
    B×n decodes run as one batched call.

    Returns (B, n_samples, 64, 64, 3).
    """
    mu, logvar, _ = encode(params, state, x, train=False)
    b = mu.shape[0]
    mu_rep = jnp.repeat(mu, n_samples, axis=0)
    logvar_rep = jnp.repeat(logvar, n_samples, axis=0)
    z = reparametrize(key, mu_rep, logvar_rep)
    if value.ndim == 0:
        value = jnp.full((b,), value)
    val_rep = jnp.repeat(value.reshape(b), n_samples, axis=0)
    recon = decode(params, z, val_rep)
    return recon.reshape(b, n_samples, *recon.shape[1:])


def inject(
    params: Params, state: State, x: jnp.ndarray,
    values: jnp.ndarray = None,
) -> jnp.ndarray:
    """Decode each frame's mu at a ladder of injected critic values.

    Reference loops 6 separate decoder calls per image (vae_nets.py:31-40);
    here all B×K decodes run as one batched call.

    Returns (B, K, 64, 64, 3).
    """
    if values is None:
        values = jnp.array([0.0, 0.2, 0.4, 0.6, 0.8, 1.0], jnp.float32)
    mu, _, _ = encode(params, state, x, train=False)
    b, k = mu.shape[0], values.shape[0]
    mu_rep = jnp.repeat(mu, k, axis=0)  # (B*K, 32)
    val_rep = jnp.tile(values, b)  # (B*K,)
    recon = decode(params, mu_rep, val_rep)
    return recon.reshape(b, k, *recon.shape[1:])


# ---------------------------------------------------------------------------
# torch checkpoint ingestion
# ---------------------------------------------------------------------------


def vae_params_from_torch(
    encoder_sd: Dict[str, np.ndarray], decoder_sd: Dict[str, np.ndarray]
) -> Tuple[Params, State]:
    """Convert reference encoder/decoder state_dicts (saved separately,
    vae.py:162-163) into the NHWC param + BN-state pytrees.

    Torch module indices: encoder convs at model.{0,4,8,12}, BN at
    model.{1,5,9,13} (vae_nets.py:68-88); decoder convs at model.{0,3,6,9,12}
    plus decoder_input (vae_nets.py:116-137).
    """
    def conv(sd, key):
        return {
            "w": jnp.asarray(np.transpose(sd[f"{key}.weight"], (2, 3, 1, 0))),
            "b": jnp.asarray(sd[f"{key}.bias"]),
        }

    def linear(sd, key):
        return {"w": jnp.asarray(sd[f"{key}.weight"].T), "b": jnp.asarray(sd[f"{key}.bias"])}

    enc: Params = {}
    state: State = {}
    for i, idx in enumerate((0, 4, 8, 12)):
        enc[f"conv{i}"] = conv(encoder_sd, f"model.{idx}")
        bn = f"model.{idx + 1}"
        enc[f"bn{i}"] = {
            "scale": jnp.asarray(encoder_sd[f"{bn}.weight"]),
            "bias": jnp.asarray(encoder_sd[f"{bn}.bias"]),
        }
        state[f"bn{i}"] = {
            "mean": jnp.asarray(encoder_sd[f"{bn}.running_mean"]),
            "var": jnp.asarray(encoder_sd[f"{bn}.running_var"]),
        }
    enc["fc_mu"] = linear(encoder_sd, "fc_mu")
    enc["fc_var"] = linear(encoder_sd, "fc_var")

    dec: Params = {"input": linear(decoder_sd, "decoder_input")}
    for i, idx in enumerate((0, 3, 6, 9, 12)):
        dec[f"conv{i}"] = conv(decoder_sd, f"model.{idx}")

    return {"encoder": enc, "decoder": dec}, state


def vae_state_dicts_to_torch(
    params: Params, state: State
) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
    """Inverse of :func:`vae_params_from_torch`: NHWC pytrees → the torch
    reference's encoder/decoder ``state_dict`` layouts (OIHW convs,
    (out, in) linears, BN running stats + ``num_batches_tracked``), so
    weights trained here load into the reference with
    ``module.load_state_dict(torch.load(path))`` (vae_utility.py:354-355).

    FiLM-conditioned models (init_vae_params film=True) cannot be exported:
    the reference decoder has no counterpart for the per-stage modulation,
    and silently dropping it would export a model that decodes differently
    — raise loudly instead.
    """
    film_keys = [k for k in params["decoder"] if k.startswith("film")]
    if film_keys:
        raise ValueError(
            f"decoder carries FiLM conditioning params {sorted(film_keys)}; "
            "the torch reference architecture (vae_nets.py:116-147) cannot "
            "represent them — export only non-film models"
        )

    def conv(p):
        return np.transpose(np.asarray(p["w"]), (3, 2, 0, 1)).copy(), np.asarray(p["b"])

    def linear(p):
        return np.ascontiguousarray(np.asarray(p["w"]).T), np.asarray(p["b"])

    enc_sd: Dict[str, np.ndarray] = {}
    for i, idx in enumerate((0, 4, 8, 12)):
        w, b = conv(params["encoder"][f"conv{i}"])
        enc_sd[f"model.{idx}.weight"], enc_sd[f"model.{idx}.bias"] = w, b
        bn = f"model.{idx + 1}"
        enc_sd[f"{bn}.weight"] = np.asarray(params["encoder"][f"bn{i}"]["scale"])
        enc_sd[f"{bn}.bias"] = np.asarray(params["encoder"][f"bn{i}"]["bias"])
        enc_sd[f"{bn}.running_mean"] = np.asarray(state[f"bn{i}"]["mean"])
        enc_sd[f"{bn}.running_var"] = np.asarray(state[f"bn{i}"]["var"])
        enc_sd[f"{bn}.num_batches_tracked"] = np.asarray(0, np.int64)
    for name in ("fc_mu", "fc_var"):
        w, b = linear(params["encoder"][name])
        enc_sd[f"{name}.weight"], enc_sd[f"{name}.bias"] = w, b

    dec_sd: Dict[str, np.ndarray] = {}
    w, b = linear(params["decoder"]["input"])
    dec_sd["decoder_input.weight"], dec_sd["decoder_input.bias"] = w, b
    for i, idx in enumerate((0, 3, 6, 9, 12)):
        w, b = conv(params["decoder"][f"conv{i}"])
        dec_sd[f"model.{idx}.weight"], dec_sd[f"model.{idx}.bias"] = w, b
    return enc_sd, dec_sd


def param_count(params: Params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
