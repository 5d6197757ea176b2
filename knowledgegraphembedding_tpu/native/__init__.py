"""ctypes loader/builder for the native host-sampling library.

Builds ``sampler.cpp`` with g++ on first use (no pybind11 in this image;
plain C ABI + ctypes). Falls back cleanly: callers check ``available()``
and use the vectorized-numpy sampler when the toolchain is missing.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "sampler.cpp")
_LIB = os.path.join(_HERE, "_libkge_sampler.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    # NB: no -march=native — the .so is disk-cached and may be loaded by a
    # different host sharing the filesystem (ISA mismatch => SIGILL); the
    # sampler is RNG+binary-search bound, -O3 portable code is plenty.
    # Build to a temp path + os.replace so a killed compiler can never leave
    # a truncated .so that poisons every future load.
    tmp = _LIB + f".tmp.{os.getpid()}"
    cmd = ["g++", "-O3", "-fopenmp", "-shared", "-fPIC", "-o", tmp, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, _LIB)
        return True
    except (OSError, subprocess.SubprocessError):
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            # a stale/corrupt/foreign-ISA .so: rebuild once before giving up
            if not _build():
                _build_failed = True
                return None
            try:
                lib = ctypes.CDLL(_LIB)
            except OSError:
                _build_failed = True
                return None
        lib.kge_sample_negatives.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.kge_sample_negatives.restype = None
        lib.kge_count_members.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ]
        lib.kge_count_members.restype = ctypes.c_int64
        lib.kge_openmp_threads.restype = ctypes.c_int
        lib.kge_set_threads.argtypes = [ctypes.c_int]
        lib.kge_set_threads.restype = None
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def openmp_threads() -> int:
    lib = _load()
    return int(lib.kge_openmp_threads()) if lib else 0


def set_threads(n: int) -> None:
    """Cap the sampler's OpenMP parallelism (the reference's -cpu flag)."""
    lib = _load()
    if lib is not None:
        lib.kge_set_threads(int(n))


def sample_negatives(
    true_enc: np.ndarray,  # i64[nnz] SORTED key*nentity+entity encodings
    row_keys: np.ndarray,  # i64[B]
    nentity: int,
    n_neg: int,
    seed: int,
) -> np.ndarray:
    """i32[B, n_neg] rejection-sampled negatives (see sampler.cpp)."""
    lib = _load()
    assert lib is not None, "native sampler unavailable"
    true_enc = np.ascontiguousarray(true_enc, np.int64)
    row_keys = np.ascontiguousarray(row_keys, np.int64)
    out = np.empty((len(row_keys), n_neg), np.int32)
    lib.kge_sample_negatives(
        true_enc.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(len(true_enc)),
        row_keys.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(len(row_keys)),
        ctypes.c_int64(nentity),
        ctypes.c_int64(n_neg),
        ctypes.c_uint64(seed & (2**64 - 1)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out


def count_members(true_enc: np.ndarray, cand_enc: np.ndarray) -> int:
    lib = _load()
    assert lib is not None, "native sampler unavailable"
    true_enc = np.ascontiguousarray(true_enc, np.int64)
    cand_enc = np.ascontiguousarray(cand_enc, np.int64)
    return int(
        lib.kge_count_members(
            true_enc.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            ctypes.c_int64(len(true_enc)),
            cand_enc.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            ctypes.c_int64(len(cand_enc)),
        )
    )
