"""Torch-free reader for PyTorch checkpoint files.

The reference's pretrained weights (`/root/reference/README.md:57-58`,
`pretrained_network_weights.zip`) are torch-saved files: since torch 1.6 a
`torch.save` file is a ZIP archive holding one pickle stream
(`<prefix>/data.pkl`) plus one raw little-endian buffer per tensor storage
(`<prefix>/data/<key>`). The pickle references storages through the
`persistent_id` protocol and rebuilds tensors with
`torch._utils._rebuild_tensor_v2(storage, offset, size, stride, ...)`.

This module replays that format with a restricted `pickle.Unpickler` and
numpy -- NO torch import -- so pretrained-weight ingestion is one command the
moment real weights are available (`tools/import_weights.py`). Only the
constructs that actually appear in checkpoints are whitelisted; anything else
raises (a checkpoint is untrusted input -- never unpickle it permissively).

Returned tensors are numpy arrays (bfloat16 via ml_dtypes).
"""

import io
import pickle
import zipfile
from collections import OrderedDict

import numpy as np

_STORAGE_DTYPES = {
    "FloatStorage": np.dtype(np.float32),
    "DoubleStorage": np.dtype(np.float64),
    "HalfStorage": np.dtype(np.float16),
    "LongStorage": np.dtype(np.int64),
    "IntStorage": np.dtype(np.int32),
    "ShortStorage": np.dtype(np.int16),
    "CharStorage": np.dtype(np.int8),
    "ByteStorage": np.dtype(np.uint8),
    "BoolStorage": np.dtype(np.bool_),
}


def _storage_dtype(name):
    if name == "BFloat16Storage":
        import ml_dtypes

        return np.dtype(ml_dtypes.bfloat16)
    if name not in _STORAGE_DTYPES:
        raise ValueError(f"unsupported torch storage type: {name}")
    return _STORAGE_DTYPES[name]


class _StorageType:
    """Marker for `torch.XStorage` globals inside the pickle stream."""

    def __init__(self, name):
        self.name = name


def _rebuild_tensor_v2(storage, offset, size, stride, requires_grad=False,
                       backward_hooks=None, metadata=None):
    arr = storage
    if not size:
        return arr[offset:offset + 1].reshape(())
    itemsize = arr.dtype.itemsize
    out = np.lib.stride_tricks.as_strided(
        arr[offset:], shape=tuple(int(s) for s in size),
        strides=tuple(int(s) * itemsize for s in stride),
    )
    return np.ascontiguousarray(out)


def _rebuild_parameter(data, requires_grad=False, backward_hooks=None):
    return data


class _TorchUnpickler(pickle.Unpickler):
    """Whitelisting unpickler: tensors -> numpy, everything exotic -> error."""

    def __init__(self, file, read_storage):
        super().__init__(file, encoding="latin1")
        self._read_storage = read_storage

    def persistent_load(self, pid):
        if not (isinstance(pid, tuple) and pid and pid[0] == "storage"):
            raise pickle.UnpicklingError(f"unknown persistent id: {pid!r}")
        _, storage_type, key, _location, numel = pid
        name = (storage_type.name if isinstance(storage_type, _StorageType)
                else str(storage_type))
        dtype = _storage_dtype(name)
        buf = self._read_storage(str(key))
        arr = np.frombuffer(buf, dtype=dtype)
        if numel is not None and arr.size < int(numel):
            raise pickle.UnpicklingError(
                f"storage {key} holds {arr.size} elements, expected {numel}")
        return arr

    def find_class(self, module, name):
        if (module, name) == ("collections", "OrderedDict"):
            return OrderedDict
        if module == "torch._utils" and name == "_rebuild_tensor_v2":
            return _rebuild_tensor_v2
        if module == "torch._utils" and name == "_rebuild_parameter":
            return _rebuild_parameter
        if module == "torch" and name.endswith("Storage"):
            return _StorageType(name)
        if (module, name) == ("torch", "Size"):
            return tuple
        raise pickle.UnpicklingError(
            f"refusing to unpickle {module}.{name} (torch checkpoints need "
            "only tensors/dicts; extend the whitelist if a legitimate "
            "construct is missing)")


def load_torch_file(path_or_file):
    """Read a torch-saved checkpoint file -> python object with numpy tensors.

    Args:
        path_or_file: filesystem path or binary file-like of a torch>=1.6
            zip-format checkpoint.
    Returns:
        The checkpoint object (dicts/lists/scalars with tensors as numpy).
    """
    zf = zipfile.ZipFile(path_or_file, "r")
    pkl_names = [n for n in zf.namelist() if n.endswith("/data.pkl")
                 or n == "data.pkl"]
    if not pkl_names:
        raise ValueError(
            "not a torch>=1.6 zip checkpoint (no data.pkl entry); the legacy "
            "tar/pickle format is not supported -- re-save with a modern torch")
    pkl_name = pkl_names[0]
    prefix = pkl_name[: -len("data.pkl")]

    def read_storage(key):
        return zf.read(f"{prefix}data/{key}")

    with zf.open(pkl_name) as f:
        return _TorchUnpickler(io.BytesIO(f.read()), read_storage).load()


def load_state_dict(path_or_file):
    """Read a checkpoint and return its flat name -> numpy state dict.

    Handles both a bare `state_dict` file (magicleap `superpoint_v1.pth`) and
    the reference's training checkpoint layout `{epoch, model, optimizer,
    min_val_loss, pose_match_ratio}` (`/root/reference/helpers.py:27-33`).
    """
    obj = load_torch_file(path_or_file)
    if isinstance(obj, dict) and "model" in obj and isinstance(
            obj["model"], dict):
        obj = obj["model"]
    if not isinstance(obj, dict) or not all(
            isinstance(v, np.ndarray) for v in obj.values()):
        raise ValueError("checkpoint does not contain a flat tensor state dict")
    return dict(obj)
