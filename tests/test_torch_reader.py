"""Torch-FREE checkpoint file reading (VERDICT r3 item 3).

The test EMITS a real torch-format zip checkpoint without torch -- the same
wire format `torch.save` produces since 1.6 (zip with `<prefix>/data.pkl` +
`<prefix>/data/<key>` storages, tensors rebuilt via
`torch._utils._rebuild_tensor_v2` and the persistent-id storage protocol,
emitted here with a pickler over fake `torch`/`torch._utils` module stubs) --
then round-trips it through `models/torch_reader.py` and the full
`tools/import_weights.py` CLI into files the eval CLIs consume.
"""

import io
import os
import pickle
import sys
import types
import zipfile
from collections import OrderedDict

import numpy as np
import pytest

from tests.test_torch_import import synth_matcher_sd, synth_superpoint_sd

_DTYPE_TO_STORAGE = {
    np.dtype(np.float32): "FloatStorage",
    np.dtype(np.float64): "DoubleStorage",
    np.dtype(np.int64): "LongStorage",
    np.dtype(np.uint8): "ByteStorage",
}


class _FakeStorage:
    def __init__(self, key, numel, storage_name):
        self.key = key
        self.numel = numel
        self.storage_name = storage_name


class _FakeTensor:
    """Pickles exactly like a torch tensor (REDUCE of _rebuild_tensor_v2)."""

    def __init__(self, arr, key):
        self.arr = np.ascontiguousarray(arr)
        self.key = key

    def __reduce_ex__(self, protocol):
        import torch._utils  # the fake module installed by _fake_torch()

        storage = _FakeStorage(self.key, self.arr.size,
                               _DTYPE_TO_STORAGE[self.arr.dtype])
        size = self.arr.shape
        stride = tuple(s // self.arr.itemsize for s in self.arr.strides)
        return (torch._utils._rebuild_tensor_v2,
                (storage, 0, size, stride, False, OrderedDict()))


class _fake_torch:
    """Temporarily install minimal `torch`/`torch._utils` stubs so pickling a
    _FakeTensor emits the same GLOBAL opcodes a real torch.save would (the
    originals are restored on exit so a real torch stays usable)."""

    def __enter__(self):
        self.saved = {k: sys.modules.get(k) for k in ("torch", "torch._utils")}
        torch = types.ModuleType("torch")
        torch._fake = True
        utils = types.ModuleType("torch._utils")

        def _rebuild_tensor_v2(*args):  # never called; pickled by reference
            raise AssertionError

        _rebuild_tensor_v2.__module__ = "torch._utils"
        _rebuild_tensor_v2.__qualname__ = "_rebuild_tensor_v2"
        utils._rebuild_tensor_v2 = _rebuild_tensor_v2
        for name in _DTYPE_TO_STORAGE.values():
            cls = type(name, (), {"__module__": "torch"})
            setattr(torch, name, cls)
        torch._utils = utils
        sys.modules["torch"] = torch
        sys.modules["torch._utils"] = utils
        return torch

    def __exit__(self, *exc):
        for k, v in self.saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


class _Pickler(pickle.Pickler):
    def persistent_id(self, obj):
        if isinstance(obj, _FakeStorage):
            import torch

            return ("storage", getattr(torch, obj.storage_name), obj.key,
                    "cpu", obj.numel)
        return None


def write_torch_zip(path, obj):
    """Emit `obj` (tensors as numpy) in torch>=1.6 zip checkpoint format.

    Uses REAL `torch.save` when torch is importable (the strongest wire-format
    oracle -- this image ships cpu torch); falls back to a faithful fake-module
    pickler emitting the same opcodes, so the test survives torch-free images.
    """
    try:
        import torch as _torch

        if not getattr(_torch, "_fake", False):
            def to_t(x):
                if isinstance(x, np.ndarray):
                    return _torch.from_numpy(np.ascontiguousarray(x))
                if isinstance(x, dict):
                    return OrderedDict((k, to_t(v)) for k, v in x.items())
                if isinstance(x, (list, tuple)):
                    return type(x)(to_t(v) for v in x)
                return x

            _torch.save(to_t(obj), path)
            return
    except ImportError:
        pass
    _write_fake_torch_zip(path, obj)


def _write_fake_torch_zip(path, obj):
    storages = {}
    counter = [0]

    def wrap(x):
        if isinstance(x, np.ndarray):
            key = str(counter[0])
            counter[0] += 1
            storages[key] = np.ascontiguousarray(x)
            return _FakeTensor(x, key)
        if isinstance(x, dict):
            return OrderedDict((k, wrap(v)) for k, v in x.items())
        if isinstance(x, (list, tuple)):
            return type(x)(wrap(v) for v in x)
        return x

    with _fake_torch():
        wrapped = wrap(obj)
        buf = io.BytesIO()
        _Pickler(buf, protocol=2).dump(wrapped)
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("archive/data.pkl", buf.getvalue())
        zf.writestr("archive/version", "3")
        for key, arr in storages.items():
            zf.writestr(f"archive/data/{key}", arr.tobytes())


def test_fake_emitter_matches_reader(tmp_path, rng):
    """The torch-free fallback emitter produces the same wire format the
    reader expects (kept honest even on images that ship torch)."""
    from e2e_multi_view_matching_tpu.models.torch_reader import load_torch_file

    obj = {"w": rng.normal(size=(3, 5)).astype(np.float32),
           "idx": np.arange(6, dtype=np.int64).reshape(2, 3)}
    path = tmp_path / "fake.pt"
    _write_fake_torch_zip(path, obj)
    back = load_torch_file(str(path))
    for k, v in obj.items():
        np.testing.assert_array_equal(back[k], v)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_reader_roundtrips_tensors(tmp_path, rng):
    from e2e_multi_view_matching_tpu.models.torch_reader import load_torch_file

    obj = {
        "model": {
            "a.weight": rng.normal(size=(4, 3, 3, 3)).astype(np.float32),
            "a.bias": rng.normal(size=(4,)).astype(np.float32),
            "count": np.asarray([7], np.int64),
        },
        "epoch": 5,
        "min_val_loss": 1.25,
    }
    path = tmp_path / "ckpt.pt"
    write_torch_zip(path, obj)
    back = load_torch_file(str(path))
    assert back["epoch"] == 5 and back["min_val_loss"] == 1.25
    for k, v in obj["model"].items():
        np.testing.assert_array_equal(back["model"][k], v)


def test_reader_rejects_malicious_globals(tmp_path):
    """A checkpoint is untrusted input: non-whitelisted globals must raise,
    never execute."""
    from e2e_multi_view_matching_tpu.models.torch_reader import load_torch_file

    class Evil:
        def __reduce__(self):
            return (os.system, ("true",))

    buf = io.BytesIO()
    pickle.Pickler(buf, protocol=2).dump({"model": Evil()})
    path = tmp_path / "evil.pt"
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("archive/data.pkl", buf.getvalue())
    with pytest.raises(pickle.UnpicklingError, match="refusing"):
        load_torch_file(str(path))


def test_import_weights_cli_end_to_end(tmp_path, rng):
    """Torch-format files -> import_weights CLI -> files the eval CLIs load,
    matching a direct in-memory import of the same state dicts."""
    import jax.numpy as jnp
    from flax import serialization

    from e2e_multi_view_matching_tpu.models.matcher import default_gnn_layers
    from e2e_multi_view_matching_tpu.models.superpoint import (
        SuperPoint, SuperPointConfig,
    )
    from e2e_multi_view_matching_tpu.models.torch_import import (
        import_matcher, import_superpoint,
    )
    from tools.import_weights import main as import_main

    schedule = default_gnn_layers(2, 1)
    sp_sd = synth_superpoint_sd(rng)
    m_sd = synth_matcher_sd(rng, schedule)
    sp_path = tmp_path / "superpoint_v1.pth"
    m_path = tmp_path / "model.ckpt"
    write_torch_zip(sp_path, sp_sd)  # magicleap file: bare state dict
    write_torch_zip(m_path, {  # reference save_ckpt layout (helpers.py:27-33);
        # synth_matcher_sd already carries the DataParallel "module." prefix
        "epoch": 3, "model": m_sd, "min_val_loss": 0.5,
        "pose_match_ratio": 0.99,
    })
    out_dir = tmp_path / "exp"
    import_main(["--superpoint", str(sp_path), "--matcher", str(m_path),
                 "--out_dir", str(out_dir), "--gnn_layers", "2",
                 "--cross_attention_layers", "1"])

    # superpoint.ckpt deserializes into real SuperPoint variables and matches
    # the direct import
    sp = SuperPoint(SuperPointConfig(max_keypoints=16))
    import jax

    key = jax.random.PRNGKey(0)
    template = sp.init({"params": key, "keypoints": key},
                       jnp.zeros((1, 32, 32, 1)))
    with open(out_dir / "superpoint.ckpt", "rb") as f:
        loaded = serialization.from_bytes(template, f.read())
    direct = import_superpoint(sp_sd)
    for k in ("conv1a", "convDb"):
        np.testing.assert_array_equal(
            np.asarray(loaded["params"]["net"][k]["kernel"]),
            direct["params"]["net"][k]["kernel"])

    # model.ckpt restores through the training checkpoint loader
    from flax import traverse_util

    raw = serialization.msgpack_restore((out_dir / "model.ckpt").read_bytes())
    direct_m = import_matcher(m_sd, schedule)
    flat_l = traverse_util.flatten_dict(raw["params"])
    flat_d = traverse_util.flatten_dict(direct_m["params"])
    assert set(flat_l) == set(flat_d)
    for k in flat_d:
        np.testing.assert_array_equal(np.asarray(flat_l[k]), flat_d[k])


def test_weights_zip_discovery(tmp_path, rng):
    """--weights_zip auto-discovers nested torch files inside the bundle."""
    from tools.import_weights import main as import_main

    sp_sd = synth_superpoint_sd(rng)
    inner_sp = io.BytesIO()
    write_torch_zip(inner_sp, sp_sd)
    bundle = tmp_path / "pretrained_network_weights.zip"
    with zipfile.ZipFile(bundle, "w") as zf:
        zf.writestr("weights/superpoint_v1.pth", inner_sp.getvalue())
    out_dir = tmp_path / "exp2"
    import_main(["--weights_zip", str(bundle), "--out_dir", str(out_dir)])
    assert (out_dir / "superpoint.ckpt").exists()
