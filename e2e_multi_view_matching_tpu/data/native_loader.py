"""ctypes binding for the native host runtime (libemvm_native.so).

Provides:
- `load_batch(rgb_paths, depth_paths, out_h, out_w)`: threaded JPEG+PNG decode
  directly into numpy buffers (the native replacement for the reference's torch
  DataLoader worker pool).
- `overlap_matrix(depths, poses, intr, stride)`: the pairwise scene overlap
  matrix used to generate the tuple sampler's candidate JSONs.

The library is built with `python -m e2e_multi_view_matching_tpu.data.native_loader build`
(cmake + ninja into native/build). All entry points raise a clear error when
the library is absent; callers fall back to the pure-Python path.
"""

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "build", "libemvm_native.so")
_lib = None


def build(native_dir=_NATIVE_DIR):
    """Compile the native library + tools (cmake + ninja)."""
    build_dir = os.path.join(native_dir, "build")
    os.makedirs(build_dir, exist_ok=True)
    subprocess.run(
        ["cmake", "-G", "Ninja", "-DCMAKE_BUILD_TYPE=Release", ".."],
        cwd=build_dir, check=True, capture_output=True,
    )
    subprocess.run(["ninja"], cwd=build_dir, check=True, capture_output=True)
    return os.path.join(build_dir, "libemvm_native.so")


def available():
    return os.path.exists(_LIB_PATH)


def _load():
    global _lib
    if _lib is None:
        if not available():
            raise RuntimeError(
                f"native library not built ({_LIB_PATH}); run "
                "`python -m e2e_multi_view_matching_tpu.data.native_loader build`"
            )
        lib = ctypes.CDLL(_LIB_PATH)
        lib.emvm_load_gray_jpeg.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ]
        lib.emvm_load_depth_png.argtypes = lib.emvm_load_gray_jpeg.argtypes
        lib.emvm_jpeg_size.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.emvm_png_size.argtypes = lib.emvm_jpeg_size.argtypes
        lib.emvm_load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
        ]
        lib.emvm_overlap_matrix.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_float,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ]
        _lib = lib
    return _lib


def _fp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _dp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def jpeg_size(path):
    lib = _load()
    h = ctypes.c_int()
    w = ctypes.c_int()
    if lib.emvm_jpeg_size(path.encode(), ctypes.byref(h), ctypes.byref(w)) != 0:
        raise IOError(f"failed to read {path}")
    return h.value, w.value


def png_size(path):
    lib = _load()
    h = ctypes.c_int()
    w = ctypes.c_int()
    if lib.emvm_png_size(path.encode(), ctypes.byref(h), ctypes.byref(w)) != 0:
        raise IOError(f"failed to read {path}")
    return h.value, w.value


def load_gray(path, out_h, out_w):
    lib = _load()
    out = np.empty((out_h, out_w), np.float32)
    if lib.emvm_load_gray_jpeg(path.encode(), _fp(out), out_h, out_w) != 0:
        raise IOError(f"failed to decode {path}")
    return out


def load_depth(path, out_h, out_w):
    lib = _load()
    out = np.empty((out_h, out_w), np.float32)
    if lib.emvm_load_depth_png(path.encode(), _fp(out), out_h, out_w) != 0:
        raise IOError(f"failed to decode {path}")
    return out


def load_batch(rgb_paths, depth_paths, out_h, out_w, n_threads=0):
    """Threaded batch decode: returns (images (n, H, W) [0,1], depths (n, H, W) m)."""
    lib = _load()
    n = len(rgb_paths)
    images = np.empty((n, out_h, out_w), np.float32)
    depths = np.empty((n, out_h, out_w), np.float32)
    if n_threads <= 0:
        n_threads = min(n, os.cpu_count() or 1)
    rgb_arr = (ctypes.c_char_p * n)(*[p.encode() for p in rgb_paths])
    dep_arr = (ctypes.c_char_p * n)(*[p.encode() for p in depth_paths])
    failed = lib.emvm_load_batch(rgb_arr, dep_arr, n, out_h, out_w, _fp(images),
                                 _fp(depths), n_threads)
    if failed:
        raise IOError(f"{failed} of {n} batch loads failed")
    return images, depths


def overlap_matrix(depths, poses, intr, stride=8, depth_consistency=0.1,
                   n_threads=0):
    """Pairwise symmetric-mean overlap matrix.

    Args:
        depths: (n, h, w) float32 meters; poses: (n, 4, 4) cam->world;
        intr: (n, 3, 3).
    Returns:
        (n, n) float32 overlaps in [0, 1].
    """
    lib = _load()
    depths = np.ascontiguousarray(depths, np.float32)
    poses = np.ascontiguousarray(poses, np.float64)
    intr = np.ascontiguousarray(intr[..., :3, :3], np.float64)
    n, h, w = depths.shape
    out = np.empty((n, n), np.float32)
    if n_threads <= 0:
        n_threads = os.cpu_count() or 1
    lib.emvm_overlap_matrix(_fp(depths), _dp(poses), _dp(intr), n, h, w, stride,
                            ctypes.c_float(depth_consistency), _fp(out), n_threads)
    return out


if __name__ == "__main__":
    import sys

    if len(sys.argv) > 1 and sys.argv[1] == "build":
        print(build())
