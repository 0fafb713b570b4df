"""Dense-CRF extension tests (C++ permutohedral mean-field)."""

import numpy as np
import pytest

from critic_vae_tpu.crf import densecrf, densecrf_batch, refine_masks
from critic_vae_tpu.data.synthetic import generate_frames
from critic_vae_tpu.ops.iou import iou

PARAMS = (22.0, 12.0, 3.1, 8.0, 1.8, 10)  # reference tuple (vae_utility.py:25-30)


@pytest.fixture(scope="module")
def episode():
    frames, gt = generate_frames(8, seed=3)
    rng = np.random.default_rng(0)
    noisy = gt ^ (rng.random(gt.shape) < 0.08)
    return frames, gt, noisy


def test_refinement_improves_noisy_masks(episode):
    frames, gt, noisy = episode
    refined = refine_masks(frames, noisy, PARAMS)
    assert iou(gt, refined) > iou(gt, noisy) + 0.2


def test_batch_matches_single(episode):
    frames, _, noisy = episode
    batch = refine_masks(frames, noisy, PARAMS)
    m0 = noisy[0].astype(np.float32)
    single = densecrf(frames[0], np.stack([1 - m0, m0], axis=-1), PARAMS)
    np.testing.assert_array_equal(batch[0], single.astype(bool))


def test_confident_probs_are_stable():
    """A clean, high-contrast segmentation should survive CRF unchanged."""
    img = np.zeros((32, 32, 3), np.uint8)
    img[:, 16:] = 255
    mask = np.zeros((32, 32), np.float32)
    mask[:, 16:] = 1.0
    seg = densecrf(img, np.stack([1 - mask, mask], axis=-1), PARAMS)
    assert (seg == mask).mean() > 0.98


def test_zero_iters_returns_argmax():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    prob = rng.random((16, 16, 2)).astype(np.float32)
    prob /= prob.sum(-1, keepdims=True)
    seg = densecrf(img, prob, (22, 12, 3.1, 8, 1.8, 0))
    np.testing.assert_array_equal(seg, np.argmax(prob, -1).astype(np.uint8))


def test_shape_validation():
    with pytest.raises(ValueError):
        densecrf(np.zeros((8, 8, 3), np.uint8), np.zeros((9, 9, 2), np.float32), PARAMS)
    with pytest.raises(ValueError):
        densecrf_batch(
            np.zeros((2, 8, 8, 3), np.uint8), np.zeros((3, 8, 8, 2), np.float32), PARAMS
        )


def test_squeezes_reference_batch1_layout():
    """The reference passes (1, H, W, 3) frames into denseCRF
    (vae_utility.py:36-39 via crf_imgs[:, np.newaxis]); accept that shape."""
    img = np.zeros((1, 16, 16, 3), np.uint8)
    prob = np.full((16, 16, 2), 0.5, np.float32)
    seg = densecrf(img, prob, PARAMS)
    assert seg.shape == (16, 16)


def test_scaffold_grid_rerefines_sequentially(episode):
    """A multi-combination grid refines the PREVIOUS combination's output
    (the reference re-reads its mutated mask[::skip] view each iteration)."""
    from critic_vae_tpu.crf import crf_reference_scaffold, refine_masks

    frames, gt, noisy = episode
    mask = noisy[:, None].astype(np.float32)
    grid = {"w1": [22.0], "alpha": [12.0], "beta": [3.1],
            "w2": [8.0], "gamma": [1.8], "iters": [5, 10]}
    out, results = crf_reference_scaffold(frames, mask.copy(), gt, param_grid=grid)

    step1 = refine_masks(frames, noisy, (22.0, 12.0, 3.1, 8.0, 1.8, 5))
    step2 = refine_masks(frames, step1, (22.0, 12.0, 3.1, 8.0, 1.8, 10))
    np.testing.assert_array_equal(out[:, 0], step2)
    assert len(results) == 2
    assert results[0][0] <= results[1][0]  # ascending-IoU order


def test_scaffold_skip_passes_unrefined_frames_through(episode):
    frames, gt, noisy = episode
    mask = noisy[:, None].astype(np.float32)
    from critic_vae_tpu.crf import crf_reference_scaffold

    out, _ = crf_reference_scaffold(frames, mask.copy(), gt, skip=2)
    np.testing.assert_array_equal(out[1::2, 0], noisy[1::2].astype(bool))
    assert not np.array_equal(out[0::2, 0], noisy[0::2].astype(bool))


def test_backend_policy_auto():
    """crf/policy.py resolution matrix (VERDICT r3 #7/#8)."""
    import pytest

    from critic_vae_tpu.crf.policy import resolve_crf_backend

    # accelerator, single-process, small: device on the DEFAULT path
    assert resolve_crf_backend(
        "auto", 64, 64, backend_platform="tpu", process_count=1
    ) == "device"
    assert resolve_crf_backend(
        "auto", 128, 128, backend_platform="tpu", process_count=1
    ) == "device"
    # CPU backend, multi-host, or big resolution: host
    assert resolve_crf_backend(
        "auto", 64, 64, backend_platform="cpu", process_count=1
    ) == "host"
    assert resolve_crf_backend(
        "auto", 64, 64, backend_platform="tpu", process_count=2
    ) == "host"
    assert resolve_crf_backend(
        "auto", 256, 256, backend_platform="tpu", process_count=1
    ) == "host"
    # explicit requests pass through; round 5 made 256² LEGAL for an
    # explicit device request (measured 1.61x host, crf_256.json) while
    # auto stays host there; past 256² still errors loudly
    assert resolve_crf_backend("host", 256, 256) == "host"
    assert resolve_crf_backend(
        "device", 128, 128, backend_platform="cpu", process_count=4
    ) == "device"
    assert resolve_crf_backend("device", 256, 256) == "device"
    with pytest.raises(ValueError, match="host"):
        resolve_crf_backend("device", 512, 512)
    with pytest.raises(ValueError, match="auto|host|device"):
        resolve_crf_backend("lattice", 64, 64)
