"""Checkpoint IO + TensorBoard event writer tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from critic_vae_tpu.io import checkpoint as ckpt
from critic_vae_tpu.io.events import EventWriter, MetricLogger, _crc32c


def test_pytree_roundtrip(tmp_path):
    tree = {
        "a": jnp.arange(6.0).reshape(2, 3),
        "nested": {"b": jnp.ones((4,), jnp.int32), "c": [jnp.zeros(2), jnp.ones(1)]},
    }
    p = str(tmp_path / "t.npz")
    ckpt.save_pytree(p, tree)
    out = ckpt.load_pytree(p, tree)
    for x, y in zip(jax.tree.leaves(tree), jax.tree.leaves(out)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_prng_key_roundtrip(tmp_path):
    tree = {"rng": jax.random.key(42), "x": jnp.zeros(3)}
    p = str(tmp_path / "k.npz")
    ckpt.save_pytree(p, tree)
    out = ckpt.load_pytree(p, tree)
    # restored key must produce identical randomness
    a = jax.random.normal(tree["rng"], (4,))
    b = jax.random.normal(out["rng"], (4,))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_load_errors_are_loud(tmp_path):
    """Unlike the reference's silent random-weights fallback
    (vae_utility.py:353-357), bad checkpoints must raise."""
    p = str(tmp_path / "t.npz")
    ckpt.save_pytree(p, {"a": jnp.zeros((2, 2))})
    with pytest.raises(KeyError):
        ckpt.load_pytree(p, {"a": jnp.zeros((2, 2)), "missing": jnp.zeros(1)})
    with pytest.raises(ValueError):
        ckpt.load_pytree(p, {"a": jnp.zeros((3, 3))})


def test_train_state_roundtrip_and_latest(tmp_path):
    from critic_vae_tpu.train.step import init_train_state

    state, _ = init_train_state(jax.random.key(0))
    d = str(tmp_path)
    ckpt.save_train_state(os.path.join(d, "ckpt-3.npz"), state)
    ckpt.save_train_state(os.path.join(d, "ckpt-12.npz"), state)
    latest = ckpt.latest_checkpoint(d)
    assert latest is not None and latest[1] == 12
    restored = ckpt.restore_train_state(latest[0], state)
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    ckpt.prune_checkpoints(d, keep=1)
    assert ckpt.latest_checkpoint(d)[1] == 12
    assert not os.path.exists(os.path.join(d, "ckpt-3.npz"))


def test_crc32c_known_vectors():
    # RFC 3720 test vector: 32 bytes of zeros → 0x8a9136aa
    assert _crc32c(b"\x00" * 32) == 0x8A9136AA
    assert _crc32c(b"123456789") == 0xE3069283


def test_event_file_readable_by_tensorboard(tmp_path):
    tb = pytest.importorskip("tensorboard.backend.event_processing.event_file_loader")
    d = str(tmp_path / "logs")
    with EventWriter(d) as w:
        w.scalar("recon_loss", 0.5, 10)
        w.scalar("kld", 0.01, 10)
        w.scalar("recon_loss", 0.25, 20)
        path = w.path
    from tensorboard.util import tensor_util

    events = list(tb.EventFileLoader(path).Load())
    assert events[0].file_version == "brain.Event:2"
    # the loader migrates simple_value into new-style tensor protos
    scalars = [
        (e.step, v.tag, float(tensor_util.make_ndarray(v.tensor)))
        for e in events
        for v in (e.summary.value if e.summary else [])
    ]
    assert (10, "recon_loss", 0.5) in scalars
    assert (20, "recon_loss", 0.25) in scalars


def test_metric_logger_jsonl(tmp_path):
    import json

    d = str(tmp_path / "logs")
    logger = MetricLogger(d)
    logger.log({"total_loss": 1.25, "kld": 0.5}, step=7)
    logger.close()
    lines = open(os.path.join(d, "metrics.jsonl")).read().splitlines()
    rec = json.loads(lines[0])
    assert rec["step"] == 7 and rec["total_loss"] == 1.25


def test_histogram_readable_by_tensorboard(tmp_path):
    tb = pytest.importorskip("tensorboard.backend.event_processing.event_file_loader")
    d = str(tmp_path / "hlogs")
    rng = np.random.default_rng(0)
    vals = rng.normal(size=1000)
    with EventWriter(d) as w:
        w.histogram("weights", vals, step=5)
        path = w.path
    from tensorboard.util import tensor_util

    events = list(tb.EventFileLoader(path).Load())
    # the loader migrates old-style histos to (bins, 3) [left, right, count]
    histos = [
        (e.step, v.tag, tensor_util.make_ndarray(v.tensor))
        for e in events
        for v in (e.summary.value if e.summary else [])
        if v.WhichOneof("value") == "tensor"
    ]
    assert len(histos) == 1
    step, tag, h = histos[0]
    assert step == 5 and tag == "weights"
    assert h.shape == (30, 3)
    assert h[:, 2].sum() == 1000  # total count
    assert h[0, 0] <= vals.min() + 1e-5  # f32 edge vs f64 min rounding


def test_image_readable_by_tensorboard(tmp_path):
    """The reference's image_summary is dead (commented out, logger.py:17-28);
    ours writes a real Summary.Image that TB's loader decodes back to the
    original pixels."""
    tb = pytest.importorskip("tensorboard.backend.event_processing.event_file_loader")
    d = str(tmp_path / "ilogs")
    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 256, (16, 24, 3), np.uint8)
    grey = rng.random((8, 8)).astype(np.float32)
    with EventWriter(d) as w:
        w.image("recon", rgb, step=3)
        w.image("diff", grey, step=3)
        path = w.path

    events = list(tb.EventFileLoader(path).Load())
    # the loader migrates old-style images to a DT_STRING tensor of
    # [width, height, encoded_png] under the "images" plugin
    images = {
        v.tag: (e.step, v.tensor.string_val)
        for e in events
        for v in (e.summary.value if e.summary else [])
        if v.metadata.plugin_data.plugin_name == "images"
    }
    assert set(images) == {"recon", "diff"}
    import io

    from PIL import Image as PILImage

    step, (w_, h_, png) = images["recon"]
    assert step == 3 and (w_, h_) == (b"24", b"16")
    decoded = np.asarray(PILImage.open(io.BytesIO(png)))
    np.testing.assert_array_equal(decoded, rgb)

    _, (_, _, png_g) = images["diff"]
    decoded_g = np.asarray(PILImage.open(io.BytesIO(png_g)))
    np.testing.assert_array_equal(decoded_g, (np.clip(grey, 0, 1) * 255).astype(np.uint8))


def test_save_pytree_handles_file_key_and_rejects_collisions(tmp_path):
    """A leaf named 'file' must not collide with np.savez's own parameter,
    and two distinct leaves flattening to one '/'-path must raise instead
    of silently overwriting."""
    from critic_vae_tpu.io.checkpoint import load_pytree, save_pytree

    p = str(tmp_path / "f.npz")
    tree = {"file": np.arange(3, dtype=np.float32), "a": {"b": np.ones(2, np.float32)}}
    save_pytree(p, tree)
    out = load_pytree(p, tree)
    np.testing.assert_array_equal(out["file"], tree["file"])

    with pytest.raises(ValueError, match="same key"):
        save_pytree(str(tmp_path / "c.npz"), {"a": {"b": np.ones(1)}, "a/b": np.ones(1)})


def test_save_pytree_rejects_lossy_dtypes_and_load_checks_dtype(tmp_path):
    """bfloat16 leaves silently round-trip through .npz as raw void arrays —
    refuse at save; and a dtype drift between checkpoint and template is a
    loud error at load."""
    import jax.numpy as jnp

    from critic_vae_tpu.io.checkpoint import load_pytree, save_pytree

    with pytest.raises(TypeError, match="round-trip"):
        save_pytree(str(tmp_path / "bf.npz"), {"w": np.asarray(jnp.ones(2, jnp.bfloat16))})

    p = str(tmp_path / "d.npz")
    save_pytree(p, {"w": np.ones(2, np.float32)})
    with pytest.raises(ValueError, match="dtype"):
        load_pytree(p, {"w": np.ones(2, np.float64)})


def test_event_filenames_are_unique_per_writer(tmp_path):
    d = str(tmp_path / "logs")
    with EventWriter(d) as a, EventWriter(d) as b:
        assert a.path != b.path
