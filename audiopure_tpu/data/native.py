"""ctypes bindings for the native C++ WAV batch loader.

The shared library (``native/wavloader.cpp``) is compiled on first use with
the toolchain baked into the image; if compilation or loading fails, every
entry point degrades gracefully to the pure-Python reader in ``wavio.py``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libwavloader.so")

_lib = None
_lib_lock = threading.Lock()
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lib_lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            if not os.path.exists(_LIB_PATH) or (
                    os.path.getmtime(_LIB_PATH) < os.path.getmtime(
                        os.path.join(_NATIVE_DIR, "wavloader.cpp"))):
                subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                               capture_output=True)
            lib = ctypes.CDLL(_LIB_PATH)
            lib.wavloader_decode.restype = ctypes.c_int
            lib.wavloader_decode.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64, ctypes.POINTER(ctypes.c_int)]
            lib.wavloader_decode_batch.restype = ctypes.c_int
            lib.wavloader_decode_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
                ctypes.c_int]
            _lib = lib
        except Exception:
            _build_failed = True
    return _lib


def available() -> bool:
    return _load() is not None


def decode_wav(path: str, target_len: int
               ) -> Optional[Tuple[np.ndarray, int]]:
    """Decode one file to exactly ``target_len`` float32 samples (zero
    padded / truncated). None on failure -> caller uses the Python path."""
    lib = _load()
    if lib is None:
        return None
    out = np.zeros(target_len, dtype=np.float32)
    sr = ctypes.c_int(0)
    r = lib.wavloader_decode(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        target_len, ctypes.byref(sr))
    if r < 0:
        return None
    return out, int(sr.value)


def decode_batch(paths: List[str], target_len: int,
                 n_threads: Optional[int] = None) -> Optional[np.ndarray]:
    """Decode a batch into one (n, target_len) float32 array with a C++
    thread pool. None if any file fails (caller falls back)."""
    lib = _load()
    if lib is None:
        return None
    if n_threads is None:
        n_threads = min(8, max(2, os.cpu_count() or 2))
    n = len(paths)
    out = np.zeros((n, target_len), dtype=np.float32)
    lengths = np.zeros(n, dtype=np.int32)
    srs = np.zeros(n, dtype=np.int32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    ok = lib.wavloader_decode_batch(
        arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        target_len, lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        srs.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), n_threads)
    if ok != n:
        return None
    return out


class NativeBatchLoader:
    """Fast path for fixed-length eval/training batches: paths -> device-
    ready (B, L) float32 via the C++ pool, bypassing per-item transforms."""

    def __init__(self, target_len: int = 16000,
                 n_threads: Optional[int] = None):
        self.target_len = target_len
        self.n_threads = n_threads

    def __call__(self, items):
        paths = [it["path"] for it in items]
        out = decode_batch(paths, self.target_len, self.n_threads)
        if out is None:  # fallback
            from audiopure_tpu.data.wavio import read_wav
            rows = []
            for p in paths:
                s, _ = read_wav(p)
                s = np.pad(s[: self.target_len],
                           (0, max(0, self.target_len - len(s))))
                rows.append(s)
            out = np.stack(rows)
        return {"samples": out,
                "target": np.asarray([it["target"] for it in items]),
                "path": paths}
