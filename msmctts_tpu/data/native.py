"""ctypes binding for the native feature-IO core (native/msmc_io.cc).

Reads .npy (with row slicing) and .wav files through a C++ thread pool —
the GIL-free replacement for the reference's DataLoader worker processes
+ python partial readers (datasets/__init__.py:24, utils/utils.py:20-134).

The library auto-builds with g++ on first use if the .so is missing;
callers fall back to the numpy/scipy paths when unavailable
(``native_available()``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libmsmc_io.so"))
_lib = None
_load_failed = False


def _load():
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    try:
        if not os.path.isfile(_LIB_PATH):
            src = os.path.join(_NATIVE_DIR, "msmc_io.cc")
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
                 src, "-o", _LIB_PATH],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(_LIB_PATH)
        lib.msmc_read_npy.restype = ctypes.c_int
        lib.msmc_read_npy.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int),
            ctypes.c_int64,
            ctypes.c_int64,
        ]
        lib.msmc_read_wav.restype = ctypes.c_int
        lib.msmc_read_wav.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.msmc_read_batch.restype = None
        lib.msmc_read_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.c_int,
        ]
        _lib = lib
    except Exception:
        _load_failed = True
    return _lib


def native_available() -> bool:
    return _load() is not None


def read_npy(path: str, row_start: int = 0, row_count: int = -1,
             max_elems: Optional[int] = None) -> np.ndarray:
    """Row-sliced .npy read returning float32 [rows, ...]."""
    lib = _load()
    assert lib is not None
    if max_elems is None:
        max_elems = max(os.path.getsize(path), 64)  # bytes >= element count
    out = np.empty(max_elems, np.float32)
    shape = (ctypes.c_int64 * 8)()
    ndim = ctypes.c_int()
    rc = lib.msmc_read_npy(
        path.encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_elems,
        shape,
        ctypes.byref(ndim),
        row_start,
        row_count,
    )
    if rc != 0:
        raise IOError(f"msmc_read_npy({path}) failed with code {rc}")
    dims = tuple(shape[i] for i in range(ndim.value))
    n = int(np.prod(dims))
    return out[:n].reshape(dims).copy()


def read_wav(path: str, max_samples: Optional[int] = None) -> Tuple[np.ndarray, int]:
    """Mono float32 waveform + sample rate."""
    lib = _load()
    assert lib is not None
    if max_samples is None:
        max_samples = max(os.path.getsize(path), 64)
    out = np.empty(max_samples, np.float32)
    n = ctypes.c_int64()
    sr = ctypes.c_int()
    rc = lib.msmc_read_wav(
        path.encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_samples,
        ctypes.byref(n),
        ctypes.byref(sr),
    )
    if rc != 0:
        raise IOError(f"msmc_read_wav({path}) failed with code {rc}")
    return out[: n.value].copy(), sr.value


def read_batch(
    paths: List[str],
    kinds: List[int],
    caps: Optional[List[int]] = None,
    n_threads: int = 0,
) -> Tuple[List[np.ndarray], List[int]]:
    """Parallel read of a mixed npy/wav batch (kind 0 = npy, 1 = wav);
    all files load concurrently in C++ threads with the GIL released.
    Returns (arrays, sample_rates) — sample rate is 0 for npy entries."""
    lib = _load()
    assert lib is not None
    n = len(paths)
    if caps is None:
        # file size in bytes upper-bounds the float count for every
        # supported dtype (f4/f8/i4/i8 npy, 16/32-bit wav)
        caps = [max(os.path.getsize(p), 64) for p in paths]
    arenas = [np.empty(c, np.float32) for c in caps]
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    c_kinds = (ctypes.c_int * n)(*kinds)
    c_outs = (ctypes.POINTER(ctypes.c_float) * n)(
        *[a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)) for a in arenas]
    )
    c_caps = (ctypes.c_int64 * n)(*caps)
    c_shapes = (ctypes.c_int64 * (8 * n))()
    c_ndims = (ctypes.c_int * n)()
    c_status = (ctypes.c_int * n)()
    lib.msmc_read_batch(
        c_paths, n, c_kinds, c_outs, c_caps, c_shapes, c_ndims, c_status, n_threads
    )
    out, srs = [], []
    for i in range(n):
        if c_status[i] != 0:
            raise IOError(f"native read failed for {paths[i]} (code {c_status[i]})")
        dims = tuple(c_shapes[i * 8 + j] for j in range(c_ndims[i]))
        m = int(np.prod(dims))
        out.append(arenas[i][:m].reshape(dims).copy())
        srs.append(int(c_shapes[i * 8 + 1]) if kinds[i] == 1 else 0)
    return out, srs
