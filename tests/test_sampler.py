"""Balanced critic-bin sampler tests (reference: vae_utility.py:393-462)."""

import numpy as np

from critic_vae_tpu.data.sampler import balanced_critic_sampler, select_balanced


def _reference_select(preds, collect=150):
    """Literal transcription of the reference's per-frame if/elif chain
    (vae_utility.py:431-457) for ground truth."""
    c_high = c_mid = c_low = 0
    taken = []
    for i, pred in enumerate(preds):
        if c_high >= collect and c_low >= collect and c_mid >= collect:
            break
        elif 0.4 <= pred <= 0.6 and c_mid < collect:
            taken.append(i); c_mid += 1
        elif pred >= 0.7 and c_high < collect:
            taken.append(i); c_high += 1
        elif pred <= 0.25 and c_low < collect:
            taken.append(i); c_low += 1
    return taken


def test_matches_reference_chain():
    rng = np.random.default_rng(0)
    preds = rng.random(5000).astype(np.float32)
    idx, bins = select_balanced(preds, collect=150)
    assert list(idx) == _reference_select(preds)


def test_dead_zones_are_dropped():
    preds = np.array([0.3, 0.65, 0.26, 0.39, 0.61, 0.69], np.float32)
    idx, _ = select_balanced(preds)
    assert len(idx) == 0


def test_bin_caps():
    preds = np.concatenate([
        np.full(10, 0.9), np.full(10, 0.5), np.full(10, 0.1)
    ]).astype(np.float32)
    idx, bins = select_balanced(preds, collect=4)
    assert (bins == 2).sum() == 4 and (bins == 1).sum() == 4 and (bins == 0).sum() == 4


def test_early_break_when_all_full():
    preds = np.tile(np.array([0.9, 0.5, 0.1], np.float32), 100)
    idx, _ = select_balanced(preds, collect=2)
    # all bins full after 6 frames; must not scan usefully beyond
    assert idx.max() <= 8


class _FakeCritic:
    """Identity-like critic stub: pred = mean pixel value of the frame."""


def test_sampler_total_stop(monkeypatch):
    import critic_vae_tpu.data.sampler as samp

    monkeypatch.setattr(
        samp, "score_frames",
        lambda cp, frames, batch_size=0: frames.mean(axis=(1, 2, 3)),
    )

    def trajs():
        rng = np.random.default_rng(1)
        for t in range(10):
            vals = rng.random(300).astype(np.float32)
            frames = np.broadcast_to(
                vals[:, None, None, None], (300, 64, 64, 3)
            ).copy()
            yield f"t{t}", frames

    out = samp.balanced_critic_sampler(trajs(), None, total_images=200, collect=150)
    # stops at the first trajectory boundary past 200 (like the reference's
    # check at vae_utility.py:408)
    assert 200 <= len(out) <= 500


def test_ragged_streams_compile_bounded_shapes(critic_params):
    """20 random-length trajectories must land on ≤3 compiled program shapes
    (pad_to_bucket's two buckets) — real MineRL streams are ragged and fresh
    compiles cost 30 s–10 min on the tunneled backend (VERDICT r3 #4;
    reference semantics: vae_utility.py:393-462)."""
    import jax

    import critic_vae_tpu.data.sampler as samp
    import critic_vae_tpu.pipelines.dataset as ds
    from critic_vae_tpu.models import vae as vae_mod

    vae_params, bn_state = vae_mod.init_vae_params(jax.random.key(0))
    recon_fn = ds.make_recon_fn(vae_params, bn_state, batch_size=32)

    samp._score_chunk._clear_cache()
    ds._recon_both._clear_cache()
    rng = np.random.default_rng(7)
    for _ in range(20):
        n = int(rng.integers(1, 70))
        frames = rng.random((n, 64, 64, 3), np.float32)
        preds = samp.score_frames(critic_params, frames, batch_size=32)
        assert preds.shape == (n,)
        rp, rz = recon_fn(frames, preds)
        assert rp.shape == (n, 64, 64, 3) and rz.shape == (n, 64, 64, 3)
    assert samp._score_chunk._cache_size() <= 3
    assert ds._recon_both._cache_size() <= 3


def test_pad_to_bucket_values_unchanged():
    """Padding must not change the scores of the valid prefix."""
    from critic_vae_tpu.data.sampler import pad_to_bucket

    rng = np.random.default_rng(3)
    frames = rng.random((11, 64, 64, 3), np.float32)
    padded, valid = pad_to_bucket(frames, 32)
    assert valid == 11 and padded.shape[0] == 32  # 11 > 32//4 → full bucket
    np.testing.assert_array_equal(padded[:valid], frames)
    small, sv = pad_to_bucket(frames[:5], 32)
    assert sv == 5 and small.shape[0] == 8  # 5 ≤ 32//4 → quarter bucket
    # over-batch input passes through untouched
    big = rng.random((40, 64, 64, 3), np.float32)
    out, v = pad_to_bucket(big, 32)
    assert v == 40 and out is big


def test_recon_mode_bin_routing(monkeypatch):
    """mid-bin frames contribute BOTH recons, high only recon@pred, low only
    recon@0 (vae_utility.py:431-443)."""
    import critic_vae_tpu.data.sampler as samp

    preds = np.array([0.9, 0.5, 0.1], np.float32)
    monkeypatch.setattr(samp, "score_frames", lambda cp, f, batch_size=0: preds)
    frames = np.stack([np.full((64, 64, 3), v, np.float32) for v in (1.0, 0.5, 0.0)])

    def recon_fn(sel, p):
        return sel + 100.0, sel + 200.0  # distinguishable markers

    out = samp.balanced_critic_sampler(
        [("t", frames)], None, recon_fn=recon_fn, total_images=100
    )
    # expected: high→pred(101), mid→pred(100.5) + zero(200.5), low→zero(200)
    vals = sorted(out[:, 0, 0, 0].tolist())
    assert vals == [100.5, 101.0, 200.0, 200.5]
