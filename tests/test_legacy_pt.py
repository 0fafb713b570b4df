"""Legacy torch .pt reader tests (pure Python vs torch.load ground truth)."""

import numpy as np
import pytest

from critic_vae_tpu.io.legacy_pt import load_torch_pt
from tests.conftest import CRITIC_PT, CRITIC_PT_2, requires_reference, requires_torch


@requires_reference
@pytest.mark.parametrize("path", [CRITIC_PT, CRITIC_PT_2])
def test_bundled_critic_structure(path):
    sd = load_torch_pt(path)
    # known structure: 14 tensors, 11,873 params (SURVEY §2.1 #6)
    assert len(sd) == 14
    assert sum(v.size for v in sd.values()) == 11873
    assert sd["features.0.weight"].shape == (8, 3, 3, 3)
    assert sd["crit.4.bias"].shape == (1,)
    assert all(v.dtype == np.float32 for v in sd.values())


@requires_reference
@requires_torch
@pytest.mark.parametrize("path", [CRITIC_PT, CRITIC_PT_2])
def test_bit_exact_vs_torch(path):
    import torch

    ours = load_torch_pt(path)
    ref = torch.load(path, weights_only=True, map_location="cpu")
    assert set(ours) == set(ref)
    for k in ref:
        np.testing.assert_array_equal(ours[k], ref[k].numpy())


@requires_torch
def test_zipfile_format_roundtrip(tmp_path):
    import torch

    obj = {
        "a.weight": torch.arange(12, dtype=torch.float32).reshape(3, 4),
        "b.bias": torch.tensor([1.5, -2.0]),
        "c.long": torch.tensor([1, 2, 3], dtype=torch.int64),
    }
    p = tmp_path / "modern.pt"
    torch.save(obj, p)  # zipfile format
    out = load_torch_pt(str(p))
    for k in obj:
        np.testing.assert_array_equal(out[k], obj[k].numpy())


@requires_torch
def test_legacy_format_roundtrip(tmp_path):
    import torch

    obj = {"w": torch.randn(5, 7), "noncontig": torch.randn(6, 8).t()}
    p = tmp_path / "legacy.pt"
    torch.save(obj, p, _use_new_zipfile_serialization=False)
    out = load_torch_pt(str(p))
    for k in obj:
        np.testing.assert_array_equal(out[k], obj[k].numpy())


def test_rejects_arbitrary_globals(tmp_path):
    import pickle

    p = tmp_path / "evil.pt"
    with open(p, "wb") as f:
        pickle.dump(0x1950A86A20F9469CFC6C, f)
        pickle.dump(1001, f)
        pickle.dump({}, f)
        f.write(b"cos\nsystem\n(S'true'\ntR.")
    with pytest.raises(Exception):
        load_torch_pt(str(p))


# ---------------------------------------------------------------------------
# writer: save_torch_pt (the interop inverse of the reader)
# ---------------------------------------------------------------------------


def test_save_torch_pt_roundtrip_own_reader(tmp_path):
    from critic_vae_tpu.io.legacy_pt import load_torch_pt, save_torch_pt

    rng = np.random.default_rng(0)
    sd = {
        "conv.weight": rng.normal(size=(8, 3, 5, 5)).astype(np.float32),
        "conv.bias": rng.normal(size=(8,)).astype(np.float32),
        "steps": np.asarray(7, np.int64),  # 0-d tensor
        "flags": np.asarray([True, False]),
        "bytes": rng.integers(0, 255, (4, 4), dtype=np.uint8),
    }
    path = str(tmp_path / "out.pt")
    save_torch_pt(path, sd)
    back = load_torch_pt(path)
    assert set(back) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(np.asarray(back[k]), sd[k])
        assert np.asarray(back[k]).dtype == sd[k].dtype


@requires_torch
def test_save_torch_pt_loads_with_torch(tmp_path):
    import torch

    from critic_vae_tpu.io.legacy_pt import save_torch_pt

    rng = np.random.default_rng(1)
    sd = {
        "w": rng.normal(size=(4, 3, 3, 3)).astype(np.float32),
        "b": rng.normal(size=(4,)).astype(np.float64),
        "n": np.asarray(3, np.int64),
    }
    path = str(tmp_path / "out.pt")
    save_torch_pt(path, sd)
    loaded = torch.load(path, weights_only=True)
    assert set(loaded) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(loaded[k].numpy(), sd[k])


def test_save_torch_pt_rejects_unsupported_dtype(tmp_path):
    from critic_vae_tpu.io.legacy_pt import save_torch_pt

    with pytest.raises(TypeError):
        save_torch_pt(str(tmp_path / "x.pt"), {"c": np.zeros(2, np.complex64)})


def test_scalar_tensor_shapes_round_trip(tmp_path):
    """0-d tensors (torch scalars, e.g. BatchNorm num_batches_tracked) keep
    their shape through write + both readers — np.ascontiguousarray would
    silently promote them to (1,)."""
    import numpy as np

    from critic_vae_tpu.io.legacy_pt import load_torch_pt, save_torch_pt

    path = str(tmp_path / "scalar.pt")
    save_torch_pt(path, {"n": np.array(7, np.int64), "w": np.ones((2, 2), np.float32)})
    out = load_torch_pt(path)
    assert out["n"].shape == () and int(out["n"]) == 7
    assert out["w"].shape == (2, 2)

    torch = pytest.importorskip("torch")
    t = torch.load(path, weights_only=True)
    assert tuple(t["n"].shape) == () and int(t["n"]) == 7


def test_header_pickles_are_also_restricted(tmp_path):
    """A code-bearing pickle in a HEADER position (magic/protocol/sys_info/
    key_order) must die in the restricted unpickler, not execute — the main
    object pickle was always guarded; the headers must be too."""
    import pickle as _pickle

    evil = tmp_path / "evil_legacy.pt"
    with open(evil, "wb") as f:
        # first header slot: a pickle that would call os.system on load
        f.write(
            b"\x80\x02cos\nsystem\nq\x00X\x04\x00\x00\x00trueq\x01\x85q\x02Rq\x03."
        )
    with pytest.raises(_pickle.UnpicklingError, match="refusing global"):
        load_torch_pt(str(evil))


def test_zip_without_data_pkl_raises_cleanly(tmp_path):
    """A valid zip that is not a torch checkpoint gets a descriptive
    ValueError, not a bare StopIteration."""
    import zipfile as _zipfile

    p = tmp_path / "notatorch.zip"
    with _zipfile.ZipFile(p, "w") as zf:
        zf.writestr("something.txt", "hello")
    with pytest.raises(ValueError, match="no data.pkl"):
        load_torch_pt(str(p))
