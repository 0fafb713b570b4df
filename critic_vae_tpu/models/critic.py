"""The frozen critic CNN as a pure JAX function (TPU-native, NHWC).

Capability parity with the reference critic (reference: critic_net.py:5-69):
a binary tree-trunk classifier over 64×64 RGB frames —
4×[conv3×3 + ReLU + maxpool2] with channel dims (8, 8, 8, 16), a valid 4×4
conv to a 32-d embedding, then Linear(32→32)+ReLU, Linear(32→1), sigmoid.
Dropout layers exist only at train time in the reference and the critic is
always used frozen/eval (critic_net.py:66-69), so they are identity here.

Differences from the reference by design:
* **NHWC layout** — feature maps live as (B, H, W, C), the native TPU layout;
  torch OIHW conv weights are transposed to HWIO once at load time.
* **Batched** — the reference calls the critic at batch size 1 per frame in
  every pipeline (vae.py:88, vae_utility.py:173, vae_utility.py:419); here
  every entry point is shape-polymorphic in the leading batch dim and the
  pipelines batch thousands of frames per call.
* ``collect=True`` feature-map taps (critic_net.py:49-52) are provided by
  :func:`critic_apply` with ``collect=True``, returning post-pool activations.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, jnp.ndarray]


def _conv_same(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """3×3 stride-1 SAME conv, NHWC/HWIO."""
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + b


def _maxpool2(x: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


def critic_apply(
    params: Params,
    x: jnp.ndarray,
    *,
    collect: bool = False,
    train: bool = False,
    dropout_rate: float = 0.5,
    rng: jax.Array | None = None,
    return_logits: bool = False,
    tap_offset: Tuple[int, jnp.ndarray] | None = None,
    fused_pool: bool | str = False,
    block0_f32: bool = False,
    downstream_dtype=None,
    start_block: int = 0,
) -> jnp.ndarray | Tuple:  # (pred[, embeds][, tap]) as enabled below
    """Tree-trunk probability for a batch of frames.

    Args:
      params: critic parameter pytree (see :func:`critic_params_from_torch`).
      x: (B, 64, 64, 3) float frames in [0, 1], NHWC.
      collect: also return the post-pool feature maps (reference
        critic_net.py:49-52 ``collect`` path).
      train: enable dropout (reference positions: after the pools of blocks
        3 and 4 and after the MLP ReLU — critic_net.py:25,29,39). The
        reference only ships a frozen eval-mode critic; train mode exists so
        the framework can produce its own critics (train/critic.py).
      rng: dropout key (required when ``train``).
      return_logits: return pre-sigmoid logits (stable BCE training).
      tap_offset: ``(block, offset)`` — add ``offset`` to block ``block``'s
        post-pool activation and ALSO return the offset-added activation.
        This is the CAM hook (ops/saliency.py): differentiating the output
        w.r.t. a zeros ``offset`` yields ∂out/∂activation from the same
        forward, without duplicating the architecture outside this
        function. Inert when None. Composes with ``collect`` (the tap is
        appended after the embed list).
      fused_pool: serving-path conv+pool formulation (ops/poolconv.py) —
        exact up to GEMM-order reassociation (ReLU is monotone, so
        relu∘max = max∘relu over the same candidate set); post-pool
        activations (collect/tap) are unchanged. ``True`` = phase-packed
        stride-2 convs for all blocks (measured NEGATIVE on v5e, kept as a
        validated opt-in); ``"s2d"`` = space-to-depth 3×3 phase conv for
        the FIRST block only — the 3-channel 64×64 input conv is ~ALL of
        the critic's serving cost (round-4 per-block profile: prefix1
        1.52 ms vs whole critic 1.47 ms) because 3 input channels leave
        the MXU lanes empty.
      block0_f32: run the first CONV in float32 (its output casts back
        inside the conv epilogue) — measured FASTER on v5e (XLA's bf16
        conv path handles 3-channel inputs badly; round-4 calibration
        probe: 1.47 → 1.12 ms for the whole critic) and strictly more
        precise. Pass x already f32 with ``downstream_dtype`` = the bf16
        compute dtype to avoid an input cast copy.
      downstream_dtype: dtype for everything after block 0 (default
        x.dtype).
      start_block: resume from this block with x = the previous block's
        post-pool activation (serving fusion entry, ops/mask.py merged
        front-end). Incompatible with collect/tap of skipped blocks.

    Returns:
      (B, 1) probabilities in (0, 1) (or logits); with ``collect``, also a
      list of five intermediate activations; with ``tap_offset``, also the
      tapped activation (last).
    """
    dtype = x.dtype
    if train and rng is None:
        raise ValueError("train=True requires a dropout rng")
    if tap_offset is not None and not 0 <= tap_offset[0] <= 3:
        raise ValueError(
            f"tap_offset block must be in 0..3 (post-pool activations), "
            f"got {tap_offset[0]}")
    keys = jax.random.split(rng, 3) if train else [None] * 3

    def dropout(h, key):
        if not train or dropout_rate == 0.0:
            return h
        keep = 1.0 - dropout_rate
        mask = jax.random.bernoulli(key, keep, h.shape)
        return jnp.where(mask, h / keep, 0.0).astype(h.dtype)

    embeds: List[jnp.ndarray] = []
    tap = None
    if downstream_dtype is not None:
        dtype = jnp.dtype(downstream_dtype)
    if start_block > 0 and (collect or (tap_offset is not None and tap_offset[0] < start_block)):
        raise ValueError(
            "critic_apply: collect/tap of skipped blocks is unavailable "
            f"with start_block={start_block}"
        )
    for i in range(start_block, 4):
        if fused_pool == "s2d" and i == 0:
            from critic_vae_tpu.ops.poolconv import s2d_conv_pool2_phases

            y = s2d_conv_pool2_phases(x, params["conv0_w"].astype(dtype))
            x = jax.nn.relu(
                jnp.max(y, axis=3) + params["conv0_b"].astype(dtype)
            )
        elif fused_pool is True:
            from critic_vae_tpu.ops.poolconv import conv_pool2_max

            x = jax.nn.relu(conv_pool2_max(
                x, params[f"conv{i}_w"].astype(dtype),
                params[f"conv{i}_b"].astype(dtype),
            ))
        else:
            if block0_f32 and i == 0:
                # f32 conv only — the output casts back inside the conv
                # epilogue, keeping the pool/ReLU traffic in the compute
                # dtype (see models/vae.py block0_f32 note)
                x = _conv_same(
                    x.astype(jnp.float32),
                    params["conv0_w"].astype(jnp.float32),
                    params["conv0_b"].astype(jnp.float32),
                ).astype(dtype)
            else:
                x = _conv_same(x, params[f"conv{i}_w"].astype(dtype), params[f"conv{i}_b"].astype(dtype))
            x = jax.nn.relu(x)
            x = _maxpool2(x)
        if tap_offset is not None and tap_offset[0] == i:
            x = x + tap_offset[1]
            tap = x
        if collect:
            embeds.append(x)
        if i == 2:
            x = dropout(x, keys[0])
        elif i == 3:
            x = dropout(x, keys[1])
    # valid 4×4 conv: (B,4,4,16) → (B,1,1,32)
    x = jax.lax.conv_general_dilated(
        x, params["conv4_w"].astype(dtype), window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + params["conv4_b"].astype(dtype)
    x = jax.nn.relu(x)
    if collect:
        embeds.append(x)

    h = x.reshape(x.shape[0], -1)  # (B, 32)
    h = jax.nn.relu(h @ params["fc0_w"].astype(dtype) + params["fc0_b"].astype(dtype))
    h = dropout(h, keys[2])
    logit = h @ params["fc1_w"].astype(dtype) + params["fc1_b"].astype(dtype)
    pred = logit if return_logits else jax.nn.sigmoid(logit)
    out = (pred,)
    if collect:
        out = out + (embeds,)
    if tap_offset is not None:
        out = out + (tap,)
    return out if len(out) > 1 else pred


def init_critic_params(key: jax.Array, dims=(8, 8, 8, 16), bottleneck: int = 32,
                       channels: int = 3) -> Params:
    """Fresh critic parameters (torch-default uniform init) for training
    framework-native critics (the reference only ships pretrained ones)."""
    import numpy as _np

    def uniform(k, shape, fan_in):
        bound = 1.0 / _np.sqrt(fan_in)
        return jax.random.uniform(k, shape, jnp.float32, -bound, bound)

    keys = jax.random.split(key, 14)
    params: Params = {}
    cin = channels
    for i, cout in enumerate(dims):
        params[f"conv{i}_w"] = uniform(keys[2 * i], (3, 3, cin, cout), cin * 9)
        params[f"conv{i}_b"] = uniform(keys[2 * i + 1], (cout,), cin * 9)
        cin = cout
    params["conv4_w"] = uniform(keys[8], (4, 4, dims[3], bottleneck), dims[3] * 16)
    params["conv4_b"] = uniform(keys[9], (bottleneck,), dims[3] * 16)
    params["fc0_w"] = uniform(keys[10], (bottleneck, bottleneck), bottleneck)
    params["fc0_b"] = uniform(keys[11], (bottleneck,), bottleneck)
    params["fc1_w"] = uniform(keys[12], (bottleneck, 1), bottleneck)
    params["fc1_b"] = uniform(keys[13], (1,), bottleneck)
    return params


def critic_params_from_torch(state_dict: Dict[str, np.ndarray]) -> Params:
    """Convert a torch critic state_dict (OIHW convs) to the NHWC pytree.

    Key mapping follows the reference module indices (critic_net.py:15-42):
    features.{0,3,6,10,14} are the convs, crit.{1,4} the linears. Conv weights
    transpose OIHW→HWIO; linear weights transpose (out,in)→(in,out) so the
    apply path is a plain right-multiply.
    """
    conv_keys = ["features.0", "features.3", "features.6", "features.10"]
    params: Params = {}
    for i, key in enumerate(conv_keys):
        params[f"conv{i}_w"] = jnp.asarray(
            np.transpose(state_dict[f"{key}.weight"], (2, 3, 1, 0))
        )
        params[f"conv{i}_b"] = jnp.asarray(state_dict[f"{key}.bias"])
    params["conv4_w"] = jnp.asarray(
        np.transpose(state_dict["features.14.weight"], (2, 3, 1, 0))
    )
    params["conv4_b"] = jnp.asarray(state_dict["features.14.bias"])
    params["fc0_w"] = jnp.asarray(state_dict["crit.1.weight"].T)
    params["fc0_b"] = jnp.asarray(state_dict["crit.1.bias"])
    params["fc1_w"] = jnp.asarray(state_dict["crit.4.weight"].T)
    params["fc1_b"] = jnp.asarray(state_dict["crit.4.bias"])
    return params


def load_critic(path: str) -> Params:
    """Load a critic checkpoint into a JAX pytree.

    Accepts both the reference's torch ``.pt`` format (pure-Python reader,
    no torch — TPU-native replacement for vae_utility.py:363-370) and this
    framework's native ``.npz`` pytree format (critics trained with
    train/critic.py and saved via ``save_critic``).
    """
    if path.endswith(".npz"):
        import numpy as np_

        with np_.load(path) as data:
            return {k: jnp.asarray(v) for k, v in data.items()}
    from critic_vae_tpu.io.legacy_pt import load_torch_pt

    return critic_params_from_torch(load_torch_pt(path))


def critic_state_dict_to_torch(params: Params) -> Dict[str, np.ndarray]:
    """Inverse of :func:`critic_params_from_torch`: the torch reference's
    ``state_dict`` layout, so framework-trained critics load into the
    reference's ``Critic`` via torch.load (vae_utility.py:363-370)."""
    conv_keys = ["features.0", "features.3", "features.6", "features.10"]
    sd: Dict[str, np.ndarray] = {}
    for i, key in enumerate(conv_keys):
        sd[f"{key}.weight"] = np.transpose(
            np.asarray(params[f"conv{i}_w"]), (3, 2, 0, 1)
        ).copy()
        sd[f"{key}.bias"] = np.asarray(params[f"conv{i}_b"])
    sd["features.14.weight"] = np.transpose(
        np.asarray(params["conv4_w"]), (3, 2, 0, 1)
    ).copy()
    sd["features.14.bias"] = np.asarray(params["conv4_b"])
    sd["crit.1.weight"] = np.ascontiguousarray(np.asarray(params["fc0_w"]).T)
    sd["crit.1.bias"] = np.asarray(params["fc0_b"])
    sd["crit.4.weight"] = np.ascontiguousarray(np.asarray(params["fc1_w"]).T)
    sd["crit.4.bias"] = np.asarray(params["fc1_b"])
    return sd


def save_critic(path: str, params: Params) -> None:
    """Save a framework-native critic as ``.npz`` (flat key → array)."""
    import numpy as np_

    np_.savez(path, **{k: np_.asarray(v) for k, v in params.items()})
