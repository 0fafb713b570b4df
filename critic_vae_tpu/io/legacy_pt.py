"""Pure-Python reader for PyTorch ``.pt`` checkpoints → numpy pytrees.

The reference ships two pretrained critic checkpoints in the *legacy*
(non-zipfile) torch serialization format (reference: saved-networks/*.pt,
loaded at vae_utility.py:363-370). This framework must ingest them without
depending on torch, so this module implements both torch container formats
from scratch:

* **legacy format** (torch < 1.6 default): a concatenation of pickles —
  magic number, protocol version, sys_info, the object pickle (tensors
  referenced through persistent-id tuples ``('storage', type, key, location,
  numel)``), a pickle of storage keys, then for each key an ``int64`` element
  count followed by the raw little-endian storage bytes.
* **zipfile format** (torch >= 1.6): ``archive/data.pkl`` plus one raw file
  per storage under ``archive/data/``.

Only tensor-bearing containers (dict/list/tuple of tensors and scalars) are
reconstructed; arbitrary code-bearing pickles are rejected — ``find_class``
whitelists the handful of symbols torch state_dicts actually use.
"""

from __future__ import annotations

import io
import os
import pickle
import struct
import zipfile
from collections import OrderedDict
from typing import Any, BinaryIO, Dict

import numpy as np

try:  # bfloat16 support without torch; ml_dtypes ships with jax
    import ml_dtypes

    _BFLOAT16 = np.dtype(ml_dtypes.bfloat16)
except ImportError:  # pragma: no cover
    _BFLOAT16 = np.dtype(np.uint16)

_LEGACY_MAGIC = 0x1950A86A20F9469CFC6C
_LEGACY_PROTOCOL = 1001

_STORAGE_DTYPES: Dict[str, np.dtype] = {
    "FloatStorage": np.dtype("<f4"),
    "DoubleStorage": np.dtype("<f8"),
    "HalfStorage": np.dtype("<f2"),
    "BFloat16Storage": _BFLOAT16,
    "LongStorage": np.dtype("<i8"),
    "IntStorage": np.dtype("<i4"),
    "ShortStorage": np.dtype("<i2"),
    "CharStorage": np.dtype("i1"),
    "ByteStorage": np.dtype("u1"),
    "BoolStorage": np.dtype("?"),
}


class _StorageType:
    """Stand-in for ``torch.FloatStorage`` & co — carries only the dtype."""

    def __init__(self, name: str):
        self.name = name
        self.dtype = _STORAGE_DTYPES[name]


class _LazyStorage:
    """A storage referenced by the object pickle, filled in later."""

    def __init__(self, key: str, dtype: np.dtype, numel: int | None):
        self.key = key
        self.dtype = dtype
        self.numel = numel
        self.data: np.ndarray | None = None


class _TensorStub:
    """Deferred tensor: (storage, offset, shape, stride) until data arrives."""

    def __init__(self, storage: _LazyStorage, offset: int, shape, stride):
        self.storage = storage
        self.offset = offset
        self.shape = tuple(shape)
        self.stride = tuple(stride)

    def materialize(self) -> np.ndarray:
        data = self.storage.data
        if data is None:
            raise ValueError(f"storage {self.storage.key!r} was never loaded")
        itemsize = data.dtype.itemsize
        strides = tuple(s * itemsize for s in self.stride)
        view = np.lib.stride_tricks.as_strided(
            data[self.offset :], shape=self.shape, strides=strides, writeable=False
        )
        # asarray(order="C"), NOT ascontiguousarray — the latter promotes
        # 0-d tensors (torch scalars) to shape (1,).
        return np.asarray(view, order="C")


def _rebuild_tensor_v2(storage, offset, shape, stride, *_ignored):
    return _TensorStub(storage, offset, shape, stride)


def _rebuild_tensor(storage, offset, shape, stride):
    return _TensorStub(storage, offset, shape, stride)


class _Unpickler(pickle.Unpickler):
    _ALLOWED = {
        ("collections", "OrderedDict"): OrderedDict,
        ("torch._utils", "_rebuild_tensor_v2"): _rebuild_tensor_v2,
        ("torch._utils", "_rebuild_tensor"): _rebuild_tensor,
        ("torch.serialization", "_get_layout"): lambda name: name,
    }

    def __init__(self, file: BinaryIO, storages: Dict[str, _LazyStorage]):
        super().__init__(file, encoding="utf-8")
        self._storages = storages

    def find_class(self, module: str, name: str) -> Any:
        if (module, name) in self._ALLOWED:
            return self._ALLOWED[(module, name)]
        if module == "torch" and name in _STORAGE_DTYPES:
            return _StorageType(name)
        if module == "torch" and name.endswith("Tensor"):
            return name  # dead legacy metadata, never instantiated
        raise pickle.UnpicklingError(
            f"refusing to unpickle {module}.{name} from a torch checkpoint"
        )

    def persistent_load(self, pid: Any) -> Any:
        if not (isinstance(pid, tuple) and pid and pid[0] == "storage"):
            raise pickle.UnpicklingError(f"unknown persistent id {pid!r}")
        _, storage_type, key, _location, *rest = pid
        numel = rest[0] if rest else None
        key = str(key)
        if key not in self._storages:
            self._storages[key] = _LazyStorage(key, storage_type.dtype, numel)
        return self._storages[key]


def _materialize(obj: Any) -> Any:
    if isinstance(obj, _TensorStub):
        return obj.materialize()
    if isinstance(obj, OrderedDict):
        return OrderedDict((k, _materialize(v)) for k, v in obj.items())
    if isinstance(obj, dict):
        return {k: _materialize(v) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_materialize(v) for v in obj]
    if isinstance(obj, tuple):
        return tuple(_materialize(v) for v in obj)
    return obj


def _load_meta(f: BinaryIO) -> Any:
    """Unpickle primitive-only checkpoint metadata (magic / protocol /
    sys_info / key_order). ANY global reference errors out — a code-bearing
    pickle placed in a header position dies here, before validation, just
    like the guarded object pickle (`_Unpickler`)."""

    class NoGlobals(pickle.Unpickler):
        def find_class(self, module, name):
            raise pickle.UnpicklingError(
                f"refusing global {module}.{name} in torch checkpoint metadata"
            )

    return NoGlobals(f, encoding="utf-8").load()


def _load_legacy(f: BinaryIO) -> Any:
    magic = _load_meta(f)
    if magic != _LEGACY_MAGIC:
        raise ValueError(f"bad legacy torch magic: {magic!r}")
    protocol = _load_meta(f)
    if protocol != _LEGACY_PROTOCOL:
        raise ValueError(f"unsupported legacy torch protocol: {protocol!r}")
    _load_meta(f)  # sys_info — unused

    storages: Dict[str, _LazyStorage] = {}
    obj = _Unpickler(f, storages).load()

    key_order = _load_meta(f)
    for key in key_order:
        storage = storages[str(key)]
        (numel,) = struct.unpack("<q", f.read(8))
        nbytes = numel * storage.dtype.itemsize
        raw = f.read(nbytes)
        if len(raw) != nbytes:
            raise ValueError(f"truncated storage {key!r}")
        storage.data = np.frombuffer(raw, dtype=storage.dtype)
    return _materialize(obj)


def _load_zip(f: BinaryIO) -> Any:
    with zipfile.ZipFile(f) as zf:
        names = zf.namelist()
        pkl_name = next(
            (n for n in names if n.endswith("/data.pkl") or n == "data.pkl"), None
        )
        if pkl_name is None:
            raise ValueError(
                "not a torch zipfile checkpoint: no data.pkl entry "
                f"(contents: {names[:5]}...)"
            )
        prefix = pkl_name[: -len("data.pkl")]
        storages: Dict[str, _LazyStorage] = {}
        with zf.open(pkl_name) as pf:
            obj = _Unpickler(io.BytesIO(pf.read()), storages).load()
        for key, storage in storages.items():
            raw = zf.read(f"{prefix}data/{key}")
            storage.data = np.frombuffer(raw, dtype=storage.dtype)
    return _materialize(obj)


def load_torch_pt(path: str) -> Any:
    """Load a torch ``.pt`` checkpoint as numpy arrays (no torch required).

    Handles both the legacy and the zipfile container formats. Returns the
    pickled object with every tensor replaced by a contiguous ``np.ndarray``.
    """
    with open(path, "rb") as f:
        if zipfile.is_zipfile(f):
            f.seek(0)
            return _load_zip(f)
        f.seek(0)
        return _load_legacy(f)


# ---------------------------------------------------------------------------
# Writer: numpy state_dict → torch zipfile ``.pt`` (no torch required)
# ---------------------------------------------------------------------------
# The inverse of the reader above, so weights trained in this framework can
# be loaded back into the torch reference with a plain
# ``module.load_state_dict(torch.load(path))`` (reference load sites:
# vae_utility.py:354-355,366). The pickle stream is emitted opcode by opcode:
# using pickle.Pickler for torch globals would require the real torch
# objects (save_global identity checks), which this module must not import.

_STORAGE_FOR_DTYPE = {
    np.dtype("<f4"): "FloatStorage",
    np.dtype("<f8"): "DoubleStorage",
    np.dtype("<f2"): "HalfStorage",
    np.dtype("<i8"): "LongStorage",
    np.dtype("<i4"): "IntStorage",
    np.dtype("<i2"): "ShortStorage",
    np.dtype("i1"): "CharStorage",
    np.dtype("u1"): "ByteStorage",
    np.dtype("?"): "BoolStorage",
}
if _BFLOAT16 != np.dtype(np.uint16):  # only when ml_dtypes is present
    _STORAGE_FOR_DTYPE[_BFLOAT16] = "BFloat16Storage"


def _op_int(out: bytearray, n: int) -> None:
    if 0 <= n < 256:
        out += b"K" + bytes([n])  # BININT1
    elif 0 <= n < 65536:
        out += b"M" + struct.pack("<H", n)  # BININT2
    else:
        out += b"J" + struct.pack("<i", n)  # BININT

def _op_str(out: bytearray, s: str) -> None:
    b = s.encode("utf-8")
    out += b"X" + struct.pack("<I", len(b)) + b  # BINUNICODE

def _op_global(out: bytearray, module: str, name: str) -> None:
    out += b"c" + module.encode() + b"\n" + name.encode() + b"\n"  # GLOBAL

def _op_int_tuple(out: bytearray, values) -> None:
    out += b"("  # MARK
    for v in values:
        _op_int(out, int(v))
    out += b"t"  # TUPLE


def _contiguous_strides(shape) -> tuple:
    strides, acc = [], 1
    for dim in reversed(shape):
        strides.append(acc)
        acc *= dim
    return tuple(reversed(strides))


def save_torch_pt(path: str, state_dict: Dict[str, np.ndarray]) -> None:
    """Write a flat ``{name: array}`` dict as a torch zipfile ``.pt``.

    The output loads with ``torch.load(path, weights_only=True)`` (tensors
    on CPU, contiguous) and with this module's :func:`load_torch_pt`.
    """
    items = []
    for key, arr in state_dict.items():
        # np.asarray(order="C"), NOT ascontiguousarray: the latter promotes
        # 0-d arrays to shape (1,), which would silently reshape scalar
        # tensors (e.g. BatchNorm num_batches_tracked) in the written file.
        arr = np.asarray(arr, order="C")
        if arr.dtype not in _STORAGE_FOR_DTYPE:
            raise TypeError(f"{key!r}: no torch storage type for dtype {arr.dtype}")
        items.append((key, arr))

    pkl = bytearray(b"\x80\x02}(")  # PROTO 2, EMPTY_DICT, MARK
    for i, (key, arr) in enumerate(items):
        _op_str(pkl, key)
        _op_global(pkl, "torch._utils", "_rebuild_tensor_v2")
        pkl += b"("  # MARK for the args tuple
        #   persistent id: ('storage', StorageType, key, 'cpu', numel)
        pkl += b"("
        _op_str(pkl, "storage")
        _op_global(pkl, "torch", _STORAGE_FOR_DTYPE[arr.dtype])
        _op_str(pkl, str(i))
        _op_str(pkl, "cpu")
        _op_int(pkl, arr.size)
        pkl += b"tQ"  # TUPLE, BINPERSID
        _op_int(pkl, 0)  # storage_offset
        _op_int_tuple(pkl, arr.shape)
        _op_int_tuple(pkl, _contiguous_strides(arr.shape))
        pkl += b"\x89"  # NEWFALSE (requires_grad)
        _op_global(pkl, "collections", "OrderedDict")
        pkl += b")R"  # EMPTY_TUPLE, REDUCE → empty backward_hooks
        pkl += b"tR"  # close args tuple, REDUCE → the tensor
    pkl += b"u."  # SETITEMS, STOP

    import tempfile as _tempfile

    directory = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(directory, exist_ok=True)
    fd, tmp = _tempfile.mkstemp(dir=directory, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f, zipfile.ZipFile(
            f, "w", zipfile.ZIP_STORED
        ) as zf:
            zf.writestr("archive/data.pkl", bytes(pkl))
            zf.writestr("archive/byteorder", "little")
            for i, (_key, arr) in enumerate(items):
                zf.writestr(f"archive/data/{i}", arr.tobytes())
            zf.writestr("archive/version", "3\n")
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise
