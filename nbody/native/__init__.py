"""Native (C++) runtime components, bound via ctypes.

The reference's native compute is numba-JITted CIC kernels plus the
external CONCEPT/CLASS C stack (SURVEY.md §2.2).  The TPU rebuild moves
all *device* compute to Pallas/XLA; what remains host-side and hot is the
emulator's data path — the reference's per-item ``np.load`` DataGenerator
loop (`Cosmo NN5.py:204-241`).  ``npy_loader.cpp`` replaces it with a C++
thread-pool reader.

The shared library is compiled on first use with g++ (-O3 -fPIC -shared)
and cached next to the source; everything degrades gracefully to numpy if
no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "npy_loader.cpp")
_SO = os.path.join(_DIR, "libnpyloader.so")

_lock = threading.Lock()
_lib = None
_tried = False

_ERRORS = {
    -1: "cannot open file",
    -2: "bad .npy magic",
    -3: "unparseable .npy header",
    -4: "unsupported dtype (need <f4 or <f8)",
    -5: "fortran-order arrays unsupported",
    -6: "element count mismatch / capacity exceeded",
    -7: "short read",
}


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-fPIC", "-shared", "-pthread", "-std=c++17",
             _SRC, "-o", _SO],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def get_lib():
    """The loaded shared library, building it on first call; None if the
    native path is unavailable (callers fall back to numpy)."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.npy_read_f32.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_long,
        ]
        lib.npy_read_f32.restype = ctypes.c_int
        lib.npy_batch_read_f32.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_long,
            ctypes.c_int,
        ]
        lib.npy_batch_read_f32.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def read_volumes(paths, shape, n_threads: int | None = None) -> np.ndarray:
    """Read len(paths) .npy files of identical ``shape`` into one
    (M, *shape) float32 array with the C++ thread pool.

    Falls back to a numpy loop when the native library is unavailable.
    Raises ValueError on malformed/mismatched files (same condition the
    numpy path would hit).
    """
    paths = list(paths)
    per_item = int(np.prod(shape))
    out = np.empty((len(paths), *shape), dtype=np.float32)
    lib = get_lib()
    if lib is None:
        for i, p in enumerate(paths):
            v = np.load(p)
            out[i] = v.reshape(shape).astype(np.float32)
        return out
    if n_threads is None:
        n_threads = min(16, os.cpu_count() or 4)
    arr = (ctypes.c_char_p * len(paths))(
        *[os.fsencode(p) for p in paths]
    )
    rc = lib.npy_batch_read_f32(
        arr,
        len(paths),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        per_item,
        n_threads,
    )
    if rc != 0:
        raise ValueError(
            f"native npy read failed: {_ERRORS.get(rc, rc)} "
            f"(reading {len(paths)} files of shape {tuple(shape)})"
        )
    return out
