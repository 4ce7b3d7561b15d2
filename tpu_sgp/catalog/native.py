"""ctypes bindings for the native (C++) deblending hot loop.

Builds tpu_sgp/native/deblend.cpp on first use (cached .so). Falls back
cleanly to the vectorized NumPy implementation in segmentation.py when no
toolchain is present.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent / 'native'
_SRC = _NATIVE_DIR / 'deblend.cpp'
_SRC2 = _NATIVE_DIR / 'localbkg.cpp'
_SO = _NATIVE_DIR / 'libtpusgp_deblend.so'

_lib = None
_load_error: Optional[str] = None
_load_lock = threading.Lock()


def _build_shared(sources, so_path) -> None:
    """Compile sources into so_path, atomically (temp file + rename), so a
    concurrent process never observes — or caches — a half-written .so.
    Tries -fopenmp first, serial fallback on toolchains without it."""
    tmp = Path(f'{so_path}.{os.getpid()}.tmp')
    base = ['g++', '-O3', '-shared', '-fPIC', '-std=c++17',
            *[str(s) for s in sources], '-o', str(tmp)]
    try:
        try:
            subprocess.run(base[:1] + ['-fopenmp'] + base[1:],
                           check=True, capture_output=True)
        except subprocess.CalledProcessError:
            subprocess.run(base, check=True, capture_output=True)
        os.replace(tmp, so_path)
    finally:
        tmp.unlink(missing_ok=True)


def _load():
    global _lib, _load_error
    if _lib is not None or _load_error is not None:
        return _lib
    with _load_lock:
        return _load_locked()


def _load_locked():
    global _lib, _load_error
    if _lib is not None or _load_error is not None:
        return _lib
    try:
        newest_src = max(_SRC.stat().st_mtime, _SRC2.stat().st_mtime)
        if not _SO.exists() or _SO.stat().st_mtime < newest_src:
            # OpenMP threads the per-segment deblend loop on multi-core
            # hosts (results are thread-count independent by construction)
            _build_shared([_SRC, _SRC2], _SO)
        try:
            lib = ctypes.CDLL(str(_SO))
        except OSError:
            # a corrupt/stale cached .so (e.g. interrupted build from an
            # older version, ABI drift) must not brick the native path
            # forever: force one rebuild before giving up
            _build_shared([_SRC, _SRC2], _SO)
            lib = ctypes.CDLL(str(_SO))
        lib.local_background_batch.restype = None
        lib.local_background_batch.argtypes = [
            np.ctypeslib.ndpointer(np.float64, flags='C_CONTIGUOUS'),
            ctypes.c_int32, ctypes.c_int32,
            np.ctypeslib.ndpointer(np.int32, flags='C_CONTIGUOUS'),
            ctypes.c_int32, ctypes.c_int32, ctypes.c_double, ctypes.c_int32,
            np.ctypeslib.ndpointer(np.float64, flags='C_CONTIGUOUS'),
        ]
        lib.deblend_segment.restype = ctypes.c_int32
        lib.deblend_segment.argtypes = [
            np.ctypeslib.ndpointer(np.float64, flags='C_CONTIGUOUS'),
            np.ctypeslib.ndpointer(np.uint8, flags='C_CONTIGUOUS'),
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_double,
            np.ctypeslib.ndpointer(np.int32, flags='C_CONTIGUOUS'),
        ]
        lib.tpusgp_set_omp_threads.restype = ctypes.c_int32
        lib.tpusgp_set_omp_threads.argtypes = [ctypes.c_int32]
        lib.deblend_all.restype = ctypes.c_int32
        lib.deblend_all.argtypes = [
            np.ctypeslib.ndpointer(np.float64, flags='C_CONTIGUOUS'),
            np.ctypeslib.ndpointer(np.int32, flags='C_CONTIGUOUS'),
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_double,
            np.ctypeslib.ndpointer(np.int32, flags='C_CONTIGUOUS'),
        ]
        _lib = lib
    except Exception as exc:  # pragma: no cover - toolchain-dependent
        _load_error = str(exc)
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def set_omp_threads(n: int) -> int:
    """Cap the CALLING thread's OpenMP team size for the native kernels
    (libgomp ICVs are per-thread: call on the thread to be capped).
    Returns the previous cap; 0 when native/OpenMP is unavailable."""
    lib = _load()
    if lib is None:
        return 0
    return int(lib.tpusgp_set_omp_threads(int(n)))


def deblend_segment(sub: np.ndarray, inseg: np.ndarray, npixels: int,
                    nlevels: int, contrast: float):
    """Native deblend of one segment cutout. Returns the per-pixel child
    assignment (int32, 1..k inside the segment) or None when the segment
    stays single."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f'native deblend unavailable: {_load_error}')
    sub = np.ascontiguousarray(sub, np.float64)
    mask = np.ascontiguousarray(inseg, np.uint8)
    out = np.zeros(sub.shape, np.int32)
    h, w = sub.shape
    k = lib.deblend_segment(sub, mask, h, w, npixels, nlevels,
                            float(contrast), out)
    if k == 0:
        return None
    return out


def deblend_all(data: np.ndarray, seg: np.ndarray, nseg: int, npixels: int,
                nlevels: int, contrast: float) -> tuple:
    """Deblend EVERY segment of a frame in one native call (the per-segment
    ctypes dispatch cost ~0.1 ms dominated megapixel frames). ``seg`` labels
    must be 1..nseg (detect_sources output). Returns (out_seg int32 (h, w),
    n_labels) with children renumbered sequentially in parent order —
    identical to looping deblend_segment."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f'native deblend unavailable: {_load_error}')
    data = np.ascontiguousarray(data, np.float64)
    seg = np.ascontiguousarray(seg, np.int32)
    out = np.zeros(seg.shape, np.int32)
    h, w = seg.shape
    n = lib.deblend_all(data, seg, h, w, int(nseg), npixels, nlevels,
                        float(contrast), out)
    return out, int(n)


def local_background_batch(data: np.ndarray, boxes: np.ndarray, width: int,
                           sigma: float = 3.0, maxiters: int = 5
                           ) -> np.ndarray:
    """Sigma-clipped annulus medians for all sources in one native call.
    boxes: (n, 4) int32 [x0, x1, y0, y1] inclusive."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f'native localbkg unavailable: {_load_error}')
    data = np.ascontiguousarray(data, np.float64)
    boxes = np.ascontiguousarray(boxes, np.int32)
    out = np.zeros(boxes.shape[0])
    h, w = data.shape
    lib.local_background_batch(data, h, w, boxes, boxes.shape[0], width,
                               float(sigma), maxiters, out)
    return out
