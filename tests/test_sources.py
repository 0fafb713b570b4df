"""Trajectory source tests (data/sources.py)."""

import os

import numpy as np
import pytest

from critic_vae_tpu.data.sources import (
    npy_trajectories,
    open_source,
    synthetic_trajectories,
)


def test_synthetic_source_shapes():
    trajs = list(synthetic_trajectories(2, 16, seed=0))
    assert len(trajs) == 2
    name, frames = trajs[0]
    assert name == "synthetic-000"
    assert frames.shape == (16, 64, 64, 3)
    assert frames.dtype == np.float32 and frames.max() <= 1.0


def test_npy_source_loose_files_and_episode_dirs(tmp_path):
    rng = np.random.default_rng(0)
    np.save(tmp_path / "a.npy", rng.integers(0, 255, (5, 64, 64, 3), dtype=np.uint8))
    ep = tmp_path / "ep0"
    ep.mkdir()
    np.save(ep / "X.npy", rng.integers(0, 255, (7, 64, 64, 3), dtype=np.uint8))
    trajs = dict(npy_trajectories(str(tmp_path)))
    assert set(trajs) == {"a.npy", os.path.join("ep0", "X.npy")}
    assert trajs["a.npy"].shape == (5, 64, 64, 3)
    assert trajs[os.path.join("ep0", "X.npy")].shape == (7, 64, 64, 3)


def test_npy_source_empty_dir_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        list(npy_trajectories(str(tmp_path)))


def test_open_source_spec_parsing(tmp_path):
    trajs = list(open_source("synthetic:3:8"))
    assert len(trajs) == 3 and trajs[0][1].shape[0] == 8
    rng = np.random.default_rng(0)
    np.save(tmp_path / "t.npy", rng.integers(0, 255, (4, 64, 64, 3), dtype=np.uint8))
    trajs = list(open_source(str(tmp_path)))
    assert len(trajs) == 1


def test_config_defaults_match_reference():
    """Config defaults must stay value-identical to vae_parameters.py."""
    from critic_vae_tpu.config import default_config

    cfg = default_config()
    assert cfg.model.image_size == 64 and cfg.model.latent_dim == 32
    assert cfg.model.bottleneck == 4096 and cfg.model.encoder_dims == (32, 64, 128, 256)
    assert cfg.train.epochs == 7 and cfg.train.batch_size == 128
    assert cfg.train.learning_rate == 5e-5 and cfg.train.kld_weight == 1e-3
    assert cfg.train.total_images == 50_000
    assert cfg.mask.threshold == 50
    assert cfg.mask.threshold_sweep == tuple(range(0, 130, 10))
    assert cfg.mask.episode_slice == (100, 5000, 2)
    assert (cfg.mask.crf_w1, cfg.mask.crf_alpha, cfg.mask.crf_beta,
            cfg.mask.crf_w2, cfg.mask.crf_gamma, cfg.mask.crf_iters) == (
        22.0, 12.0, 3.1, 8.0, 1.8, 10)
    assert cfg.mask.bin_collect_per_trajectory == 150
    resolved = cfg.paths.resolve("images")
    assert str(resolved).endswith("images")


def test_minerl_source_with_mocked_package(monkeypatch):
    """The minerl stream (reference: vae_utility.py:393-415) without the
    actual Java stack: mock minerl.data.make and verify seed-0 shuffle,
    normalization, and the generator interface."""
    import sys
    import types

    rng = np.random.default_rng(7)

    class FakeData:
        def get_trajectory_names(self):
            return [f"traj-{i}" for i in range(5)]

        def load_data(self, name, skip_interval=0, include_metadata=False):
            n = 4 + int(name.split("-")[1])
            for i in range(n):
                obs = {"pov": rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)}
                yield obs, None, None, None, None

    fake = types.ModuleType("minerl")
    fake.data = types.SimpleNamespace(make=lambda env, num_workers: FakeData())
    monkeypatch.setitem(sys.modules, "minerl", fake)

    from critic_vae_tpu.data.sources import minerl_trajectories

    trajs = list(minerl_trajectories("/fake/root"))
    assert len(trajs) == 5
    names = [n for n, _ in trajs]
    # seed-0 shuffle of the names (reference: vae_utility.py:401-403)
    expected = [f"traj-{i}" for i in range(5)]
    np.random.default_rng(seed=0).shuffle(expected)
    assert names == expected
    for name, frames in trajs:
        assert frames.dtype == np.float32 and frames.max() <= 1.0
        assert frames.shape[1:] == (64, 64, 3)
