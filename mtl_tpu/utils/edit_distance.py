"""Levenshtein distance: native C++ core with a numpy fallback.

The reference depends on the python-Levenshtein C extension
(utils/metrics.py:3); here the native core lives in native/edit_distance.cpp,
compiled on demand and bound via ctypes. The numpy fallback implements the
same two-row DP vectorized along one axis.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
# same override as data/audio.py: a pip-installed package can point at a
# checkout's native sources; the numpy fallback serves otherwise
_NATIVE_DIR = os.environ.get("MTL_TPU_NATIVE_DIR",
                             os.path.join(_REPO_ROOT, "native"))
_SO_PATH = os.path.join(_NATIVE_DIR, "libedit.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "edit_distance.cpp")

_lib: Optional[ctypes.CDLL] = None
_lib_tried = False


def _load_native() -> Optional[ctypes.CDLL]:
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    try:
        if not os.path.exists(_SO_PATH) or (
            os.path.exists(_SRC_PATH)
            and os.path.getmtime(_SRC_PATH) > os.path.getmtime(_SO_PATH)
        ):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", _SRC_PATH, "-o", _SO_PATH],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(_SO_PATH)
        lib.edit_distance.restype = ctypes.c_int32
        lib.edit_distance.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
        ]
        lib.edit_distance_batch.restype = None
        lib.edit_distance_batch.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32, ctypes.POINTER(ctypes.c_int32),
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def _codes(s: str) -> np.ndarray:
    return np.frombuffer(s.encode("utf-32-le"), dtype=np.int32).copy()


def _np_distance(a: np.ndarray, b: np.ndarray) -> int:
    if len(a) == 0:
        return len(b)
    if len(b) == 0:
        return len(a)
    prev = np.arange(len(b) + 1, dtype=np.int32)
    for i in range(1, len(a) + 1):
        cur = np.empty_like(prev)
        cur[0] = i
        sub = prev[:-1] + (a[i - 1] != b)
        # cur[j] = min(prev[j]+1, cur[j-1]+1, sub[j-1]) — the cur[j-1]
        # dependency is sequential; use the standard trick: two candidates
        # first, then a prefix-scan-free loop only where needed.
        cand = np.minimum(prev[1:] + 1, sub)
        for j in range(1, len(b) + 1):
            c = cand[j - 1]
            if cur[j - 1] + 1 < c:
                c = cur[j - 1] + 1
            cur[j] = c
        prev = cur
    return int(prev[-1])


def distance(s1: str, s2: str) -> int:
    """Levenshtein distance between two unicode strings."""
    lib = _load_native()
    a, b = _codes(s1), _codes(s2)
    if lib is not None:
        pa = a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
        pb = b.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
        return int(lib.edit_distance(pa, len(a), pb, len(b)))
    return _np_distance(a, b)


def distance_batch(pairs: Sequence[tuple]) -> List[int]:
    """Batched distances over (hyp, gold) string pairs."""
    lib = _load_native()
    if lib is None:
        return [distance(a, b) for a, b in pairs]
    a_arrs = [_codes(a) for a, _ in pairs]
    b_arrs = [_codes(b) for _, b in pairs]
    a_off = np.zeros(len(pairs) + 1, np.int32)
    b_off = np.zeros(len(pairs) + 1, np.int32)
    np.cumsum([len(x) for x in a_arrs], out=a_off[1:])
    np.cumsum([len(x) for x in b_arrs], out=b_off[1:])
    a_flat = np.concatenate(a_arrs) if a_arrs else np.zeros(0, np.int32)
    b_flat = np.concatenate(b_arrs) if b_arrs else np.zeros(0, np.int32)
    a_flat = np.ascontiguousarray(a_flat, np.int32)
    b_flat = np.ascontiguousarray(b_flat, np.int32)
    out = np.zeros(len(pairs), np.int32)
    p = ctypes.POINTER(ctypes.c_int32)
    lib.edit_distance_batch(
        a_flat.ctypes.data_as(p), a_off.ctypes.data_as(p),
        b_flat.ctypes.data_as(p), b_off.ctypes.data_as(p),
        len(pairs), out.ctypes.data_as(p),
    )
    return out.tolist()
