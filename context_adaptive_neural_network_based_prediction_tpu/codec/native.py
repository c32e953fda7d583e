"""ctypes bindings for the native CABAC packer (native/cabac_pack.cpp).

The library is built on demand with g++ (no pip deps); if the toolchain is
unavailable the callers fall back to the pure-Python serializer.  Byte-level
equality between the two is asserted in tests.
"""

from __future__ import annotations

import ctypes
import os
import struct
import subprocess
import threading

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "cabac_pack.cpp")
_LIB = os.path.join(_REPO_ROOT, "native", "libcabac_pack.so")
_lock = threading.Lock()
_lib = None


def _build_library() -> str:
    if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
        return _LIB
    subprocess.run(
        ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB, _SRC],
        check=True, capture_output=True)
    return _LIB


def load_library():
    global _lib
    with _lock:
        if _lib is None:
            lib = ctypes.CDLL(_build_library())
            lib.pack_grid.restype = ctypes.c_int64
            lib.pack_grid.argtypes = [
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ]
            _lib = lib
    return _lib


def available() -> bool:
    try:
        load_library()
        return True
    except Exception:
        return False


def pack_grid_payload(modes: np.ndarray, qcoeffs: np.ndarray, n: int,
                      qp: int) -> bytes:
    """CABAC payload for a uniform-grid frame (no header)."""
    lib = load_library()
    modes = np.ascontiguousarray(modes, dtype=np.int32)
    qcoeffs = np.ascontiguousarray(qcoeffs, dtype=np.int32)
    nby, nbx = modes.shape
    cap = max(qcoeffs.size * 4 + 1024, 1 << 16)
    out = np.empty(cap, dtype=np.uint8)
    size = lib.pack_grid(
        modes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        qcoeffs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        nby, nbx, n, qp,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap)
    if size < 0:
        raise RuntimeError(f"pack_grid failed with code {size}")
    return bytes(out[:size])


def serialize_grid(modes: np.ndarray, qcoeffs: np.ndarray, *, width: int,
                   height: int, n: int, qp: int,
                   deblocking: bool = False) -> bytes:
    """Full bitstream (header + native CABAC payload) for the wavefront grid."""
    from .encoder import MAGIC, POLICIES, VERSION

    header = struct.pack("<4sBBBBBBBBII", MAGIC, VERSION,
                         POLICIES.index("regular"), qp, 0,
                         1 if deblocking else 0, 0, 0, n, width, height)
    return header + pack_grid_payload(modes, qcoeffs, n, qp)
