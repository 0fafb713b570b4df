"""Mask-pipeline semantics vs a literal numpy transcription of the
reference's math (vae_utility.py:256-284, 148-160)."""

import jax
import jax.numpy as jnp
import numpy as np

from critic_vae_tpu.models import vae as vae_mod
from critic_vae_tpu.ops.mask import (
    diff_images,
    episode_forward,
    iou_stacked,
    normalize_diffs,
    threshold_masks,
)
from tests.conftest import requires_reference


def _reference_normalize(diffs, max_values, thr):
    """Numpy transcription of get_diff_factor + prepare_diff + thresholding
    (vae_utility.py:106-110, 279-284, 148-160)."""
    import statistics

    mean_max = statistics.mean([float(m) for m in max_values])
    diff_factor = 1.0 / mean_max if mean_max != 0 else 0
    out_u8, out_masks = [], []
    for d in diffs:
        d = d.copy()
        d[d > mean_max] = mean_max
        d = d * diff_factor
        d = (d * 255).astype(np.uint8)
        out_u8.append(d)
        out_masks.append(d > thr)
    return np.stack(out_u8), np.stack(out_masks)


def test_normalize_matches_reference_math():
    rng = np.random.default_rng(0)
    diffs = rng.random((12, 64, 64)).astype(np.float32) * 0.4
    maxv = diffs.max(axis=(1, 2))
    ref_u8, ref_masks = _reference_normalize(diffs, maxv, thr=50)
    ours_u8, _ = normalize_diffs(jnp.asarray(diffs), jnp.asarray(maxv))
    ours_masks = threshold_masks(ours_u8, jnp.asarray([50]))[0]
    np.testing.assert_array_equal(np.asarray(ours_u8), ref_u8)
    np.testing.assert_array_equal(np.asarray(ours_masks), ref_masks)


def test_zero_diffs_edge_case():
    """mean_max == 0 → factor 0, all-black maps (vae.py:100)."""
    diffs = jnp.zeros((4, 8, 8))
    u8, mean_max = normalize_diffs(diffs, jnp.zeros((4,)))
    assert float(mean_max) == 0.0
    assert np.asarray(u8).sum() == 0


def test_threshold_sweep_matches_individual():
    rng = np.random.default_rng(1)
    u8 = jnp.asarray(rng.integers(0, 256, (6, 16, 16), dtype=np.uint8))
    ts = jnp.asarray([0, 50, 120])
    sweep = np.asarray(threshold_masks(u8, ts))
    for i, t in enumerate([0, 50, 120]):
        np.testing.assert_array_equal(sweep[i], np.asarray(u8) > t)


@requires_reference
def test_episode_forward_uint8_matches_f32(critic_params):
    """uint8 frames normalize on device; equivalent to the host-normalized
    f32 path within float noise (XLA lowers /255 to multiply-by-reciprocal,
    ≤1 ulp on the inputs), and identical after uint8 quantization."""
    import jax

    from critic_vae_tpu.models.vae import init_vae_params
    from critic_vae_tpu.ops.mask import episode_forward, normalize_diffs

    params, bn = init_vae_params(jax.random.key(0))
    rng = np.random.default_rng(7)
    u8 = rng.integers(0, 256, (8, 64, 64, 3), dtype=np.uint8)
    a = episode_forward(params, bn, critic_params, jnp.asarray(u8))
    b = episode_forward(
        params, bn, critic_params, jnp.asarray(u8.astype(np.float32) / 255.0)
    )
    np.testing.assert_allclose(np.asarray(a["preds"]), np.asarray(b["preds"]), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(a["diff"]), np.asarray(b["diff"]), rtol=5e-4, atol=1e-6
    )
    ua, _ = normalize_diffs(a["diff"], a["max_value"])
    ub, _ = normalize_diffs(b["diff"], b["max_value"])
    close = np.abs(np.asarray(ua).astype(int) - np.asarray(ub).astype(int)) <= 1
    assert close.mean() > 0.999


def test_threshold_out_of_range_is_all_false():
    """t > 255 must select nothing (reference uint8 semantics), not wrap
    modulo 256 — t=300 used to become t=44."""
    rng = np.random.default_rng(2)
    u8 = jnp.asarray(rng.integers(0, 256, (4, 8, 8), dtype=np.uint8))
    masks = np.asarray(threshold_masks(u8, jnp.asarray([256, 300, 1000])))
    assert not masks.any()


def test_diff_images_matches_two_separate_decodes():
    """The fused 2B double-decode must equal two independent decodes
    (the reference's two evaluate calls, vae_utility.py:264-265)."""
    params, state = vae_mod.init_vae_params(jax.random.key(0))
    x = jax.random.uniform(jax.random.key(1), (5, 64, 64, 3))
    values = jax.random.uniform(jax.random.key(2), (5,))
    ro, rz, grey, maxv = diff_images(params, state, x, values)

    mu, _, _ = vae_mod.encode(params, state, x, train=False)
    ref_ro = vae_mod.decode(params, mu, values)
    ref_rz = vae_mod.decode(params, mu, jnp.zeros((5,)))
    np.testing.assert_allclose(np.asarray(ro), np.asarray(ref_ro), atol=1e-6)
    np.testing.assert_allclose(np.asarray(rz), np.asarray(ref_rz), atol=1e-6)

    ref_diff = np.abs(np.asarray(ref_rz) - np.asarray(ref_ro))
    ref_grey = ref_diff @ np.array([0.2989, 0.5870, 0.1140], np.float32)
    np.testing.assert_allclose(np.asarray(grey), ref_grey, atol=1e-6)
    np.testing.assert_allclose(np.asarray(maxv), ref_grey.max(axis=(1, 2)), atol=1e-6)


def test_iou_stacked_matches_scalar():
    from critic_vae_tpu.ops.iou import iou

    rng = np.random.default_rng(3)
    gt = rng.random((7, 16, 16)) > 0.6
    masks = np.stack([rng.random((7, 16, 16)) > t for t in (0.3, 0.5, 0.9)])
    vals = np.asarray(iou_stacked(jnp.asarray(gt), jnp.asarray(masks)))
    for i in range(3):
        assert abs(vals[i] - iou(gt, masks[i], round_digits=None)) < 1e-6


@requires_reference
def test_episode_forward_chunking_invariance(critic_params):
    """Padded-chunk execution must equal one whole-batch call."""
    from critic_vae_tpu.pipelines.video import episode_device_stage

    params, state = vae_mod.init_vae_params(jax.random.key(0))
    rng = np.random.default_rng(4)
    frames = rng.random((10, 64, 64, 3)).astype(np.float32)
    whole = episode_forward(params, state, critic_params, jnp.asarray(frames))
    chunked = episode_device_stage(params, state, critic_params, frames, batch_size=4)
    for k in ("preds", "diff", "max_value"):
        np.testing.assert_allclose(
            chunked[k], np.asarray(whole[k]), atol=1e-5, err_msg=k
        )


@requires_reference
def test_episode_forward_merged_front_end_exact(critic_params):
    """front_end='merged' (one shared 3→40ch first conv, critic 3×3
    zero-padded to 5×5) must reproduce the split path: identical taps,
    branch-local bias/BN/pool/activation order preserved."""
    params, state = vae_mod.init_vae_params(jax.random.key(0))
    rng = np.random.default_rng(11)
    frames = rng.random((8, 64, 64, 3)).astype(np.float32)
    a = episode_forward(
        params, state, critic_params, jnp.asarray(frames),
        compute_dtype="float32",
    )
    b = episode_forward(
        params, state, critic_params, jnp.asarray(frames),
        compute_dtype="float32", front_end="merged",
    )
    np.testing.assert_allclose(
        np.asarray(a["preds"]), np.asarray(b["preds"]), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(a["diff"]), np.asarray(b["diff"]), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(a["max_value"]), np.asarray(b["max_value"]), rtol=1e-5
    )


@requires_reference
def test_episode_forward_merged_block0_f32_matches_split(critic_params):
    """merged + block0_f32 must match the SPLIT block0_f32 path (identical
    numerics — block 0 in f32 both ways, bf16 downstream; only the conv
    merge differs). block0_f32-vs-bf16 drift itself is a documented
    precision change, not tested for agreement here."""
    params, state = vae_mod.init_vae_params(jax.random.key(0))
    rng = np.random.default_rng(12)
    frames = rng.random((8, 64, 64, 3)).astype(np.float32)
    a = episode_forward(
        params, state, critic_params, jnp.asarray(frames),
        compute_dtype="bfloat16", block0_f32=True,
    )
    b = episode_forward(
        params, state, critic_params, jnp.asarray(frames),
        compute_dtype="bfloat16", front_end="merged", block0_f32=True,
    )
    # one bf16 ulp at the block-0 output cast (f32 summation order in the
    # merged conv) can flip downstream bf16 values: ulp(0.8) ≈ 0.0039
    np.testing.assert_allclose(
        np.asarray(a["preds"]), np.asarray(b["preds"]), atol=5e-3
    )
    ua, _ = normalize_diffs(a["diff"], a["max_value"])
    ub, _ = normalize_diffs(b["diff"], b["max_value"])
    close = np.abs(np.asarray(ua).astype(int) - np.asarray(ub).astype(int)) <= 1
    assert close.mean() > 0.99


@requires_reference
def test_episode_forward_merged_rejects_saliency(critic_params):
    import pytest

    params, state = vae_mod.init_vae_params(jax.random.key(0))
    frames = jnp.zeros((2, 64, 64, 3), jnp.float32)
    with pytest.raises(ValueError, match="merged"):
        episode_forward(
            params, state, critic_params, frames,
            front_end="merged", mask_source="saliency",
        )


def test_encode_start_block_matches_full():
    """encode(start_block=1) fed block 0's post-pool activation equals the
    full encode (serving fusion entry)."""
    params, state = vae_mod.init_vae_params(jax.random.key(3))
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.random((4, 64, 64, 3)).astype(np.float32))
    mu_full, lv_full, _ = vae_mod.encode(params, state, x, train=False)
    # block 0 by hand: conv → bias → BN → pool → ReLU (vae_nets.py:68-88)
    enc0 = params["encoder"]["conv0"]
    y = jax.lax.conv_general_dilated(
        x, enc0["w"], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + enc0["b"]
    y, _ = vae_mod._batchnorm(y, params["encoder"]["bn0"], state["bn0"], False)
    h = jax.nn.relu(vae_mod._maxpool2(y))
    mu_part, lv_part, st = vae_mod.encode(
        params, state, h, train=False, start_block=1
    )
    np.testing.assert_allclose(
        np.asarray(mu_full), np.asarray(mu_part), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(lv_full), np.asarray(lv_part), rtol=1e-5, atol=1e-6
    )
    assert set(st.keys()) == set(state.keys())


@requires_reference
def test_critic_start_block_matches_full(critic_params):
    from critic_vae_tpu.models.critic import critic_apply

    rng = np.random.default_rng(14)
    x = jnp.asarray(rng.random((4, 64, 64, 3)).astype(np.float32))
    full = critic_apply(critic_params, x)
    # block 0 by hand: conv → ReLU → pool (critic_net.py:15-29)
    y = jax.lax.conv_general_dilated(
        x, critic_params["conv0_w"], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + critic_params["conv0_b"]
    h = vae_mod._maxpool2(jax.nn.relu(y))
    part = critic_apply(critic_params, h, start_block=1)
    np.testing.assert_allclose(
        np.asarray(full), np.asarray(part), rtol=1e-5, atol=1e-6
    )


@requires_reference
def test_critic_start_block_rejects_skipped_taps(critic_params):
    import pytest

    from critic_vae_tpu.models.critic import critic_apply

    x = jnp.zeros((2, 32, 32, 8), jnp.float32)
    with pytest.raises(ValueError, match="start_block"):
        critic_apply(critic_params, x, start_block=1, collect=True)


def test_quantize_recons_matches_reference_host_cast():
    """Device uint8 quantization reproduces the reference's truncating
    (x*255).astype(uint8) exactly, including negative wrap (tanh recons go
    negative) and non-finite → 0 (vae_utility.py:387 semantics)."""
    import jax.numpy as jnp
    import numpy as np

    from critic_vae_tpu.ops.mask import quantize_recons

    rng = np.random.default_rng(0)
    x = rng.uniform(-1.0, 1.0, (4, 8, 8, 3)).astype(np.float32)
    x[0, 0, 0, 0] = np.nan
    x[0, 0, 1, 0] = np.inf

    dev = np.asarray(quantize_recons(jnp.asarray(x)))
    with np.errstate(invalid="ignore", over="ignore"):
        host = (np.nan_to_num(x, nan=0.0, posinf=0.0, neginf=0.0) * 255).astype(np.uint8)
    np.testing.assert_array_equal(dev, host)


def test_normalize_diffs_given_mean_matches_two_pass():
    import jax.numpy as jnp
    import numpy as np

    from critic_vae_tpu.ops.mask import normalize_diffs, normalize_diffs_given_mean

    rng = np.random.default_rng(1)
    diffs = jnp.asarray(rng.random((6, 8, 8)).astype(np.float32))
    maxv = jnp.max(diffs, axis=(1, 2))
    full, mean_max = normalize_diffs(diffs, maxv)
    np.testing.assert_array_equal(
        np.asarray(full),
        np.asarray(normalize_diffs_given_mean(diffs, mean_max)),
    )


def test_pack_mask_bits_roundtrip():
    """pack_mask_bits (device) → np.unpackbits (host) is exact for every
    mask pattern, and rejects widths not divisible by 8."""
    import pytest

    from critic_vae_tpu.ops.mask import pack_mask_bits, unpack_mask_bits

    rng = np.random.default_rng(0)
    masks = rng.random((5, 16, 64)) > 0.5
    packed = pack_mask_bits(jnp.asarray(masks))
    assert packed.shape == (5, 16, 8)
    assert packed.dtype == jnp.uint8
    np.testing.assert_array_equal(unpack_mask_bits(np.asarray(packed)), masks)

    for pattern in (np.zeros((2, 8, 8), bool), np.ones((2, 8, 8), bool)):
        np.testing.assert_array_equal(
            unpack_mask_bits(np.asarray(pack_mask_bits(jnp.asarray(pattern)))),
            pattern,
        )

    with pytest.raises(ValueError, match="not a multiple of 8"):
        pack_mask_bits(jnp.zeros((2, 4, 63), bool))
