"""On-device exact dense-CRF tests (crf/device.py).

The device backend computes the exact Gaussian mean-field that the C++
permutohedral lattice (crf/densecrf.cpp) approximates; both replace the
reference's external ``denseCRF`` call (vae_utility.py:39). Tests pin the
device result to an independent dense NumPy mean-field (exactness), to the
lattice backend (approximation agreement), and through the pipeline dispatch.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from critic_vae_tpu.crf import densecrf_batch, refine_masks
from critic_vae_tpu.crf.device import densecrf_device, refine_masks_device
from critic_vae_tpu.data.synthetic import generate_frames
from critic_vae_tpu.ops.iou import iou

PARAMS = (22.0, 12.0, 3.1, 8.0, 1.8, 10)  # reference tuple (vae_utility.py:25-30)


def _numpy_exact(img_u8, prob, params):
    """Independent dense mean-field in float64 — the ground-truth model."""
    w1, alpha, beta, w2, gamma, iters = params
    h, w, L = prob.shape
    n = h * w
    yy, xx = np.mgrid[0:h, 0:w]
    xy = np.stack([xx.ravel(), yy.ravel()], -1).astype(np.float64)

    def kernel(feats, weight):
        d2 = ((feats[:, None, :] - feats[None, :, :]) ** 2).sum(-1)
        k = np.exp(-0.5 * d2)
        np.fill_diagonal(k, 0.0)  # pairwise energies: j != i
        nrm = 1.0 / np.sqrt(k.sum(-1) + 1e-20)
        return weight * (nrm[:, None] * nrm[None, :]) * k

    fb = np.concatenate([xy / alpha, img_u8.reshape(n, 3).astype(np.float64) / beta], -1)
    m = kernel(fb, w1) + kernel(xy / gamma, w2)

    u = -np.log(np.maximum(prob.reshape(n, L), 1e-8))
    q = np.exp(-u)
    q /= q.sum(-1, keepdims=True)
    for _ in range(iters):
        nxt = -u + m @ q
        nxt -= nxt.max(-1, keepdims=True)
        q = np.exp(nxt)
        q /= q.sum(-1, keepdims=True)
    return q.argmax(-1).reshape(h, w).astype(np.uint8)


@pytest.fixture(scope="module")
def episode():
    frames, gt = generate_frames(6, seed=3)
    rng = np.random.default_rng(0)
    noisy = gt ^ (rng.random(gt.shape) < 0.08)
    return frames, gt, noisy


def test_matches_independent_exact_mean_field():
    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 256, (3, 20, 20, 3), np.uint8)
    m = np.zeros((3, 20, 20), np.float32)
    for i in range(3):
        cy, cx = rng.integers(4, 16, 2)
        yy, xx = np.mgrid[0:20, 0:20]
        m[i] = ((yy - cy) ** 2 + (xx - cx) ** 2 < 25).astype(np.float32)
    probs = np.stack([1 - m, m], -1)
    dev = densecrf_device(imgs, probs, PARAMS, frame_chunk=2)
    ref = np.stack([_numpy_exact(imgs[i], probs[i], PARAMS) for i in range(3)])
    np.testing.assert_array_equal(dev, ref)


def test_agrees_with_lattice_backend(episode):
    """The lattice approximates the exact kernel; segmentations should agree
    near-perfectly on real mask-refinement inputs, and the exact model
    should refine at least as well as the approximation."""
    frames, gt, noisy = episode
    dev = refine_masks_device(frames, noisy, PARAMS)
    cpp = refine_masks(frames, noisy, PARAMS)
    assert (dev == cpp).mean() > 0.99
    assert iou(gt, dev) >= iou(gt, cpp) - 0.01


def test_refinement_improves_noisy_masks(episode):
    frames, gt, noisy = episode
    refined = refine_masks_device(frames, noisy, PARAMS)
    assert iou(gt, refined) > iou(gt, noisy) + 0.2


def test_non_square_frames_match_exact():
    """H != W exercises the coordinate/reshape plumbing."""
    rng = np.random.default_rng(3)
    imgs = rng.integers(0, 256, (2, 12, 20, 3), np.uint8)
    m = np.zeros((2, 12, 20), np.float32)
    m[:, 3:8, 5:14] = 1.0
    probs = np.stack([1 - m, m], -1)
    dev = densecrf_device(imgs, probs, PARAMS)
    ref = np.stack([_numpy_exact(imgs[i], probs[i], PARAMS) for i in range(2)])
    np.testing.assert_array_equal(dev, ref)


def test_single_frame_layout():
    img = np.zeros((16, 16, 3), np.uint8)
    prob = np.full((16, 16, 2), 0.5, np.float32)
    seg = densecrf_device(img, prob, PARAMS)
    assert seg.shape == (16, 16) and seg.dtype == np.uint8


def test_zero_iters_returns_argmax():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (12, 12, 3), dtype=np.uint8)
    prob = rng.random((12, 12, 2)).astype(np.float32)
    prob /= prob.sum(-1, keepdims=True)
    seg = densecrf_device(img, prob, (22, 12, 3.1, 8, 1.8, 0))
    np.testing.assert_array_equal(seg, np.argmax(prob, -1).astype(np.uint8))


def test_bfloat16_kernels_agree(episode):
    """bf16 pairwise matrices (half the HBM traffic) should not move the
    segmentation materially."""
    frames, _, noisy = episode
    f32 = refine_masks_device(frames, noisy, PARAMS)
    bf16 = refine_masks_device(frames, noisy, PARAMS, compute_dtype="bfloat16")
    assert (f32 == bf16).mean() > 0.995


def test_shape_validation():
    with pytest.raises(ValueError):
        densecrf_device(
            np.zeros((2, 8, 8, 3), np.uint8), np.zeros((3, 8, 8, 2), np.float32), PARAMS
        )


def test_param_search_is_independent_and_sorted(episode):
    """Every combination refines the ORIGINAL masks (unlike the reference
    scaffold's sequential re-refinement) and results come back best-first."""
    from critic_vae_tpu.crf.device import crf_param_search

    frames, gt, noisy = episode
    best_masks, results = crf_param_search(
        frames, noisy, gt, {"iters": [2, 10]}
    )
    assert len(results) == 2
    assert results[0][0] >= results[1][0]
    for score, params in results:
        indep = refine_masks_device(frames, noisy, params)
        # search scores are raw; ops.iou rounds to 3 decimals (reference)
        np.testing.assert_allclose(score, iou(gt, indep), atol=5e-4)
    np.testing.assert_array_equal(
        best_masks, refine_masks_device(frames, noisy, results[0][1])
    )


def test_param_search_meshed_non_divisible(episode):
    """The pre-put corpus is padded to the mesh size: a frame count not
    divisible by the device count (6 on 8 devices — the production default
    550-frame slice is 550 % 8 ≠ 0) must search fine, return un-padded
    masks, and score identically to the un-meshed search."""
    from critic_vae_tpu.crf.device import crf_param_search
    from critic_vae_tpu.parallel.mesh import make_mesh

    frames, gt, noisy = episode
    assert len(frames) % 8 != 0
    grid = {"iters": [2]}
    best_m, res_m = crf_param_search(frames, noisy, gt, grid, mesh=make_mesh(8))
    best_s, res_s = crf_param_search(frames, noisy, gt, grid)
    assert best_m.shape == gt.shape
    np.testing.assert_array_equal(best_m, best_s)
    np.testing.assert_allclose(res_m[0][0], res_s[0][0], atol=1e-12)


def test_memory_cap_shrinks_chunk_without_changing_results(episode, monkeypatch):
    """A tight HBM budget forces chunk=1 dispatches; segmentations are
    unchanged (chunking is pure batching)."""
    frames, _, noisy = episode
    ref = refine_masks_device(frames[:3], noisy[:3], PARAMS)
    monkeypatch.setenv("CRITIC_VAE_TPU_CRF_MEM", str((64 * 64) ** 2 * 4))
    capped = refine_masks_device(frames[:3], noisy[:3], PARAMS)
    np.testing.assert_array_equal(ref, capped)


def test_mesh_sharded_equals_single_device(episode):
    """CRF chunks sharded over the 8-device mesh are identical to
    single-device (frames are embarrassingly parallel — SURVEY §2.3)."""
    from critic_vae_tpu.parallel.mesh import make_mesh

    frames, _, noisy = episode
    single = refine_masks_device(frames, noisy, PARAMS)
    sharded = refine_masks_device(frames, noisy, PARAMS, mesh=make_mesh(8))
    np.testing.assert_array_equal(single, sharded)


def test_pipeline_dispatch_device_backend(episode):
    from critic_vae_tpu.pipelines.video import _refine

    frames, _, noisy = episode
    out = _refine(frames, noisy, PARAMS, "device", 0)
    np.testing.assert_array_equal(out, refine_masks_device(frames, noisy, PARAMS))
    with pytest.raises(ValueError):
        _refine(frames, noisy, PARAMS, "gpu", 0)


def test_soft_marginals(episode):
    """soft=True returns the mean-field marginals Q: valid distributions
    whose argmax is exactly the hard segmentation (a capability the
    argmax-only C++/reference interface cannot expose)."""
    frames, _, noisy = episode
    m = noisy[:2].astype(np.float32)
    probs = np.stack([1 - m, m], -1)
    q = densecrf_device(frames[:2], probs, PARAMS, soft=True)
    hard = densecrf_device(frames[:2], probs, PARAMS)
    assert q.shape == (2, 64, 64, 2) and q.dtype == np.float32
    np.testing.assert_allclose(q.sum(-1), 1.0, atol=1e-5)
    np.testing.assert_array_equal(q.argmax(-1).astype(np.uint8), hard)
    # zero iterations -> the (clamped, renormalized) input distribution
    q0 = densecrf_device(frames[:2], probs, (22, 12, 3.1, 8, 1.8, 0), soft=True)
    np.testing.assert_allclose(q0, np.clip(probs, 1e-8, None), atol=1e-6)


# --- Pallas streaming build (crf/fused_build.py, round 3) ---------------------


@pytest.fixture(scope="module")
def small_episode():
    """32x32 frames (N=1024, tile 512) keep interpret-mode Pallas fast."""
    frames, gt = generate_frames(3, size=32, seed=5)
    rng = np.random.default_rng(2)
    noisy = gt ^ (rng.random(gt.shape) < 0.08)
    return frames, gt, noisy


def test_pallas_build_matches_xla_build():
    """The streamed bilateral matrix equals the XLA gram-built one (f32),
    away from the deep-underflow isolated-pixel regime where BOTH
    formulations are 1-ulp-unstable (rowsum ~ the 1e-20 epsilon)."""
    import jax.numpy as jnp
    import jax

    from critic_vae_tpu.crf.device import _coords, _normalized_kernel
    from critic_vae_tpu.crf.fused_build import build_bilateral

    h = w = 16
    frames, _ = generate_frames(2, size=h, seed=7)
    imgs = frames.reshape(2, h * w, 3)
    w1, alpha, beta = 22.0, 12.0, 3.1
    mb_p = np.asarray(build_bilateral(
        jnp.asarray(imgs), jnp.float32(w1), jnp.float32(alpha),
        jnp.float32(beta), h=h, w=w, out_dtype="float32",
    ))
    xy = _coords(h, w)
    mb_x = np.asarray(jax.vmap(
        lambda im: _normalized_kernel(
            xy / alpha, im.astype(jnp.float32) / beta, w1, jnp.float32,
            diag_margin=0.25 / alpha**2)
    )(jnp.asarray(imgs)))
    # diagonal exactly zero in the streamed build too
    assert np.abs(np.diagonal(mb_p, axis1=1, axis2=2)).max() == 0.0
    # stable region: rows with non-degenerate normalizers. The gram
    # formulation carries ~1e-3 relative rounding in the exponent at color
    # magnitudes ~1e4 (catastrophic cancellation the explicit-diff build
    # does not have), so per-element tolerances are relative.
    assert np.quantile(np.abs(mb_p - mb_x), 0.999) < 5e-2
    sig = np.abs(mb_x) > 1e-3
    rel = np.abs(mb_p - mb_x)[sig] / np.abs(mb_x)[sig]
    assert np.quantile(rel, 0.99) < 2e-2


def test_pallas_build_segmentation_matches_xla(small_episode):
    frames, gt, noisy = small_episode
    ref = refine_masks_device(frames, noisy, PARAMS, build="xla",
                              compute_dtype="float32")
    f32 = refine_masks_device(frames, noisy, PARAMS, build="pallas",
                              compute_dtype="float32")
    bf16 = refine_masks_device(frames, noisy, PARAMS, build="pallas",
                               compute_dtype="bfloat16")
    assert (f32 == ref).mean() >= 0.999
    assert (bf16 == ref).mean() >= 0.999


def test_pallas_build_auto_dtype_resolution(small_episode, monkeypatch):
    """build='pallas' + compute_dtype='auto' -> bf16 matrix; still agrees."""
    frames, gt, noisy = small_episode
    ref = refine_masks_device(frames, noisy, PARAMS, build="xla")
    auto = refine_masks_device(frames, noisy, PARAMS, build="pallas")
    assert (auto == ref).mean() >= 0.999


def test_pallas_build_requires_divisible_n():
    frames, _ = generate_frames(1, size=20, seed=0)  # N=400, not /128
    masks = np.zeros((1, 20, 20), bool)
    with pytest.raises(ValueError, match="divisible by 128"):
        refine_masks_device(frames, masks, PARAMS, build="pallas")


def test_build_env_override(small_episode, monkeypatch):
    frames, gt, noisy = small_episode
    monkeypatch.setenv("CRITIC_VAE_TPU_CRF_BUILD", "pallas")
    forced = refine_masks_device(frames, noisy, PARAMS, build="xla")
    monkeypatch.delenv("CRITIC_VAE_TPU_CRF_BUILD")
    ref = refine_masks_device(frames, noisy, PARAMS, build="xla")
    assert (forced == ref).mean() >= 0.999


def test_int8_build_segmentation_matches_xla(small_episode):
    """The quantized-kernel formulation (build='int8'): int8 kernel store +
    int8 matvec iterations, self-normalized from the quantized rowsums —
    must reproduce the f32/XLA segmentation."""
    frames, gt, noisy = small_episode
    ref = refine_masks_device(frames, noisy, PARAMS, build="xla",
                              compute_dtype="float32")
    u8 = refine_masks_device(frames, noisy, PARAMS, build="int8")
    assert (u8 == ref).mean() >= 0.999


def test_int8_build_soft_and_search_paths(small_episode):
    frames, gt, noisy = small_episode
    m = noisy[:2].reshape(2, -1).astype(np.float32)
    probs = np.stack([1.0 - m, m], -1).reshape(2, 32, 32, 2)
    q = densecrf_device(frames[:2], probs, PARAMS, build="int8", soft=True)
    hard = densecrf_device(frames[:2], probs, PARAMS, build="int8")
    assert q.shape == (2, 32, 32, 2) and q.dtype == np.float32
    np.testing.assert_allclose(q.sum(-1), 1.0, atol=1e-5)
    np.testing.assert_array_equal(q.argmax(-1).astype(np.uint8), hard)


def test_int8_kernel_quantization_exact():
    """build_kernel_i8's stored bytes equal round(127*k) of the f32 kernel
    and the rowsums equal the quantized-row sums."""
    import jax
    import jax.numpy as jnp

    from critic_vae_tpu.crf.device import _coords
    from critic_vae_tpu.crf.fused_build import build_kernel_i8

    h = w = 16
    frames, _ = generate_frames(2, size=h, seed=11)
    imgs = frames.reshape(2, h * w, 3)
    alpha, beta = 12.0, 3.1
    ku8, rowsum = build_kernel_i8(
        jnp.asarray(imgs), jnp.float32(alpha), jnp.float32(beta), h=h, w=w
    )
    ku8 = np.asarray(ku8).reshape(2, h * w, h * w)
    xy = np.asarray(_coords(h, w), np.float64)
    for f in range(2):
        p = xy / alpha
        c = imgs[f].astype(np.float64) / beta
        d2 = ((p[:, None] - p[None]) ** 2).sum(-1) + ((c[:, None] - c[None]) ** 2).sum(-1)
        k = np.exp(-0.5 * d2)
        np.fill_diagonal(k, 0.0)
        expect = np.round(k * 127.0)
        # f32-vs-f64 exponent rounding can flip a value sitting exactly on
        # a .5 rounding boundary; allow <=1 level on <0.1% of entries
        diff = np.abs(ku8[f].astype(np.int32) - expect.astype(np.int32))
        assert diff.max() <= 1 and (diff > 0).mean() < 1e-3
    np.testing.assert_allclose(
        np.asarray(rowsum).reshape(2, -1),
        ku8.astype(np.float64).sum(-1), rtol=1e-6)


def test_multi_mask_refinement_matches_sequential(small_episode):
    """Lane-packed T-mask refinement (the sweep workload) must equal T
    sequential single-mask refinements."""
    from critic_vae_tpu.crf.device import refine_masks_multi_device

    frames, gt, noisy = small_episode
    rng = np.random.default_rng(7)
    sets = np.stack([
        noisy,
        gt ^ (rng.random(gt.shape) < 0.15),
        np.zeros_like(gt),
    ])
    multi = refine_masks_multi_device(frames, sets, PARAMS)
    assert multi.shape == sets.shape and multi.dtype == bool
    for t in range(len(sets)):
        single = refine_masks_device(frames, sets[t], PARAMS,
                                     build="xla", compute_dtype="float32")
        assert (multi[t] == single).mean() >= 0.999, t


def test_multi_mask_device_resident_inputs(small_episode):
    """Device-array frames/masks must be used in place (no numpy coercion,
    which made device-resident sweep callers transfer-bound through the
    tunnel) and give the same refinement as host arrays."""
    from critic_vae_tpu.crf.device import refine_masks_multi_device

    frames, gt, noisy = small_episode
    rng = np.random.default_rng(11)
    sets = np.stack([noisy, gt ^ (rng.random(gt.shape) < 0.1)])
    host = refine_masks_multi_device(frames, sets, PARAMS)
    dev = refine_masks_multi_device(
        jnp.asarray(frames), jnp.asarray(sets.astype(np.uint8)), PARAMS
    )
    np.testing.assert_array_equal(host, dev)


def test_fetch_false_returns_device_result(small_episode):
    """fetch=False keeps the refinement on device (bulk result never
    crosses the host boundary) and matches the fetched path exactly —
    single- and multi-mask."""
    import jax

    from critic_vae_tpu.crf.device import refine_masks_multi_device

    frames, gt, noisy = small_episode
    host = refine_masks_device(frames, noisy, PARAMS)
    dev = refine_masks_device(frames, noisy, PARAMS, fetch=False)
    assert isinstance(dev, jax.Array)
    np.testing.assert_array_equal(host, np.asarray(dev))

    sets = np.stack([noisy, gt]).astype(np.uint8)
    host_m = refine_masks_multi_device(frames, sets, PARAMS)
    dev_m = refine_masks_multi_device(frames, sets, PARAMS, fetch=False)
    assert isinstance(dev_m, jax.Array)
    np.testing.assert_array_equal(host_m, np.asarray(dev_m))


def test_vmem_resident_matches_xla(small_episode):
    """The fully-fused resident-matrix kernel (build='vmem',
    crf/fused_resident.py): build + all mean-field iterations in one
    pallas_call, spatial term folded into the resident matrix — must
    reproduce the f32/XLA segmentation."""
    frames, gt, noisy = small_episode
    ref = refine_masks_device(frames, noisy, PARAMS, build="xla",
                              compute_dtype="float32")
    vm = refine_masks_device(frames, noisy, PARAMS, build="vmem")
    assert (vm == ref).mean() >= 0.999


def test_vmem_resident_soft_marginals(small_episode):
    """soft=True through the resident kernel: paired sigmoid marginals are
    valid distributions whose pairwise argmax equals the hard path."""
    frames, _, noisy = small_episode
    m = noisy[:2].astype(np.float32)
    probs = np.stack([1 - m, m], -1)
    q = densecrf_device(frames[:2], probs, PARAMS, build="vmem", soft=True)
    hard = densecrf_device(frames[:2], probs, PARAMS, build="vmem")
    assert q.shape == (2, 32, 32, 2) and q.dtype == np.float32
    np.testing.assert_allclose(q.sum(-1), 1.0, atol=1e-5)
    np.testing.assert_array_equal(
        (q[..., 1] > q[..., 0]).astype(np.uint8), hard)
    # zero iterations -> the (clamped, renormalized) input distribution
    q0 = densecrf_device(frames[:2], probs, (22, 12, 3.1, 8, 1.8, 0),
                         build="vmem", soft=True)
    np.testing.assert_allclose(q0, np.clip(probs, 1e-8, None), atol=1e-6)


def test_vmem_resident_multi_mask(small_episode):
    """T mask sets ride the resident matrix as paired lanes; each slice
    must match the single-mask refinement."""
    from critic_vae_tpu.crf.device import refine_masks_multi_device

    frames, gt, noisy = small_episode
    rng = np.random.default_rng(7)
    sets = np.stack([noisy, gt ^ (rng.random(gt.shape) < 0.15)])
    multi = refine_masks_multi_device(frames, sets, PARAMS, build="vmem")
    for t in range(len(sets)):
        single = refine_masks_device(frames, sets[t], PARAMS,
                                     build="xla", compute_dtype="float32")
        assert (multi[t] == single).mean() >= 0.999, t


def test_vmem_resident_rejects_oversized_frames():
    """Frames whose matrix exceeds VMEM must fail loudly (use 'pallas')."""
    frames = np.zeros((1, 128, 128, 3), np.uint8)
    masks = np.zeros((1, 128, 128), bool)
    with pytest.raises(ValueError, match="vmem"):
        refine_masks_device(frames, masks, PARAMS, build="vmem")


def test_vmem_resident_generic_l_falls_back(small_episode):
    """densecrf_device with L=3 classes under build='vmem' silently takes
    the streamed path (the paired reduction needs L=2) — and still matches
    the XLA build."""
    frames, _, noisy = small_episode
    m = noisy[:2].astype(np.float32)
    probs = np.stack([1 - m, m * 0.6, m * 0.4], -1)
    vm = densecrf_device(frames[:2], probs, PARAMS, build="vmem")
    ref = densecrf_device(frames[:2], probs, PARAMS, build="xla")
    assert (vm == ref).mean() >= 0.999


def test_pallas_build_shards_over_mesh(small_episode):
    """Round-3 gap closed: the Pallas/int8 chunk bodies dispatch through
    ``jax.shard_map`` over the frame axis under a multi-device mesh
    (pallas_call has no auto-partitioning rule), instead of silently
    requiring the XLA build. Results must equal the single-device builds."""
    from critic_vae_tpu.parallel.mesh import make_mesh

    frames, _, noisy = small_episode
    mesh = make_mesh(8)
    ref = refine_masks_device(frames, noisy, PARAMS, build="xla",
                              compute_dtype="float32")
    sharded_p = refine_masks_device(frames, noisy, PARAMS, build="pallas",
                                    mesh=mesh)
    single_p = refine_masks_device(frames, noisy, PARAMS, build="pallas")
    np.testing.assert_array_equal(sharded_p, single_p)
    assert (sharded_p == ref).mean() >= 0.999
    sharded_i8 = refine_masks_device(frames, noisy, PARAMS, build="int8",
                                     mesh=mesh)
    single_i8 = refine_masks_device(frames, noisy, PARAMS, build="int8")
    np.testing.assert_array_equal(sharded_i8, single_i8)
    sharded_vm = refine_masks_device(frames, noisy, PARAMS, build="vmem",
                                     mesh=mesh)
    single_vm = refine_masks_device(frames, noisy, PARAMS, build="vmem")
    np.testing.assert_array_equal(sharded_vm, single_vm)


def test_multi_mask_refinement_shape_validation():
    from critic_vae_tpu.crf.device import refine_masks_multi_device

    frames, gt = generate_frames(2, size=16, seed=0)
    with pytest.raises(ValueError, match="does not match"):
        refine_masks_multi_device(frames, gt[None, :1], PARAMS)
