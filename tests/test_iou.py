"""IoU metric tests (reference semantics: vae_utility.py:56-68)."""

import numpy as np

from critic_vae_tpu.ops.iou import iou, iou_batch


def test_perfect_overlap():
    m = np.zeros((4, 8, 8), bool)
    m[:, 2:5, 2:5] = True
    assert iou(m, m) == 1.0


def test_empty_masks_count_as_perfect():
    """0/0 ⇒ 1.0 (vae_utility.py:61-62)."""
    z = np.zeros((3, 8, 8), bool)
    assert iou(z, z) == 1.0


def test_disjoint():
    a = np.zeros((8, 8), bool)
    b = np.zeros((8, 8), bool)
    a[:4] = True
    b[4:] = True
    assert iou(a, b) == 0.0


def test_known_value_and_rounding():
    a = np.zeros((10,), bool)
    b = np.zeros((10,), bool)
    a[:6] = True  # gt
    b[3:9] = True  # pred: tp=3, fn=3, fp=3 → 3/9 = 0.333
    assert iou(a, b) == 0.333


def test_batch_matches_scalar():
    rng = np.random.default_rng(0)
    gt = rng.random((5, 16, 16)) > 0.5
    pred = rng.random((5, 16, 16)) > 0.5
    per = iou_batch(gt, pred)
    for i in range(5):
        assert abs(per[i] - iou(gt[i], pred[i], round_digits=None)) < 1e-6
