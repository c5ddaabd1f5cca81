"""ctypes binding for the native C++ npy batch loader.

Builds egoego_release_tpu/native/npy_loader.cpp with g++ on first use
(cached .so next to the source); falls back to numpy when no toolchain is
available.  Used by data.formats.load_of_feats for the per-frame
optical-flow feature files — the host-side data-pipeline hot path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "..", "native", "npy_loader.cpp")
_SO = os.path.join(os.path.dirname(_SRC), "npy_loader.so")
_LIB = None
_TRIED = False


def _build() -> str | None:
    src = os.path.abspath(_SRC)
    so = os.path.abspath(_SO)
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(src):
        return so
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
             src, "-o", so],
            check=True, capture_output=True,
        )
        return so
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        print(f"native npy loader unavailable ({e}); using numpy fallback")
        return None


def _lib():
    global _LIB, _TRIED
    if _LIB is None and not _TRIED:
        _TRIED = True
        so = _build()
        if so:
            lib = ctypes.CDLL(so)
            lib.load_npy_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.c_long, ctypes.c_int,
            ]
            lib.load_npy_batch.restype = ctypes.c_int
            _LIB = lib
    return _LIB


def load_npy_batch(paths: list[str], floats_per_file: int,
                   n_threads: int = 8) -> np.ndarray:
    """Load a batch of same-shaped float npy files -> (N, floats_per_file)
    float32.  Multithreaded C++ when available, numpy otherwise."""
    n = len(paths)
    out = np.empty((n, floats_per_file), dtype=np.float32)
    lib = _lib()
    if lib is not None:
        arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        rc = lib.load_npy_batch(
            arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            floats_per_file, n_threads,
        )
        if rc == 0:
            return out
        # fall through to numpy to surface a proper python error for file rc-1
        print(f"native loader failed on {paths[rc - 1]}; retrying with numpy")
    for i, p in enumerate(paths):
        out[i] = np.load(p).reshape(-1).astype(np.float32)
    return out
