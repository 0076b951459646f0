"""ctypes bindings for the native batch assembler (with numpy fallback).

Builds ``mixstage_tpu/native/libbatcher.so`` on first use (g++ via make) and
exposes:

* ``gather_windows(data, starts, steps, stride)`` — strided window gather,
* ``znorm_mask(x, mean, var, mask, joints)`` — fused ZNorm + RemoveJoints →
  float32,
* ``znorm_f32(x, mean, var)`` — plain ZNorm → float32.

All functions return exactly what the numpy reference path returns
(``tests/test_native.py`` pins this); when the toolchain is unavailable the
numpy implementations are used transparently.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

_NATIVE_DIR = Path(__file__).parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libbatcher.so"
_lib: Optional[ctypes.CDLL] = None
_tried = False
_lib_lock = threading.Lock()  # prefetch workers can race the first build


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", str(_NATIVE_DIR), "-s"], check=True,
                       capture_output=True)
        return _LIB_PATH.exists()
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lib_lock:
        return _load_lib_locked()


def _load_lib_locked() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:  # another thread won the race
        return _lib
    _tried = True
    if not _LIB_PATH.exists() and not _build():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        lib.gather_windows.argtypes = [f64p, ctypes.c_int64, ctypes.c_int64,
                                       i64p, ctypes.c_int64, ctypes.c_int64,
                                       ctypes.c_int64, f64p]
        lib.znorm_mask.argtypes = [f64p, ctypes.c_int64, ctypes.c_int64,
                                   ctypes.c_int64, f64p, f64p, i64p,
                                   ctypes.c_int64, ctypes.c_double, f32p]
        lib.znorm_f32.argtypes = [f64p, ctypes.c_int64, ctypes.c_int64,
                                  f64p, f64p, ctypes.c_double, f32p]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def gather_windows(data: np.ndarray, starts: Sequence[int], steps: int,
                   stride: int) -> np.ndarray:
    """(rows, cols) + window starts → (n, steps, cols)."""
    data = np.ascontiguousarray(data, np.float64)
    starts = np.ascontiguousarray(starts, np.int64)
    lib = get_lib()
    if lib is None:
        idx = starts[:, None] + stride * np.arange(steps)[None, :]
        idx = np.minimum(idx, data.shape[0] - 1)
        return data[idx]
    out = np.empty((len(starts), steps, data.shape[1]), np.float64)
    lib.gather_windows(data, data.shape[0], data.shape[1], starts,
                       len(starts), steps, stride, out)
    return out


def znorm_mask(x: np.ndarray, mean: np.ndarray, var: np.ndarray,
               mask: Sequence[int], eps: float = 1e-8) -> np.ndarray:
    """Fused ZNorm + joint masking: (n, t, 2*J) f64 → (n, t, 2*(J-|mask|)) f32."""
    x = np.ascontiguousarray(x, np.float64)
    n, t, feats = x.shape
    joints = feats // 2
    keep = np.ascontiguousarray(
        sorted(set(range(joints)) - set(mask)), np.int64)
    mean = np.ascontiguousarray(np.broadcast_to(mean, (feats,)), np.float64)
    var = np.ascontiguousarray(np.broadcast_to(var, (feats,)), np.float64)
    lib = get_lib()
    if lib is None:
        std = np.sqrt(var * (var >= 0))
        std = np.where(std == 0, eps, std)
        z = (x - mean) / std
        z = z.reshape(n, t, 2, joints)[..., keep]
        return z.reshape(n, t, -1).astype(np.float32)
    out = np.empty((n, t, 2 * len(keep)), np.float32)
    lib.znorm_mask(x, n, t, feats, mean, var, keep, len(keep), eps, out)
    return out


def znorm_f32(x: np.ndarray, mean: np.ndarray, var: np.ndarray,
              eps: float = 1e-8) -> np.ndarray:
    """Plain ZNorm to float32 over the trailing feature axis."""
    x = np.ascontiguousarray(x, np.float64)
    feats = x.shape[-1]
    outer = int(np.prod(x.shape[:-1]))
    mean = np.ascontiguousarray(np.broadcast_to(mean, (feats,)), np.float64)
    var = np.ascontiguousarray(np.broadcast_to(var, (feats,)), np.float64)
    lib = get_lib()
    if lib is None:
        std = np.sqrt(var * (var >= 0))
        std = np.where(std == 0, eps, std)
        return ((x - mean) / std).astype(np.float32)
    out = np.empty(x.shape, np.float32)
    lib.znorm_f32(x.reshape(outer, feats), outer, feats, mean, var, eps, out.reshape(outer, feats))
    return out
