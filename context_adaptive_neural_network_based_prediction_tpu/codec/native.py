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
_SRC_RDOQ = os.path.join(_REPO_ROOT, "native", "rdoq.cpp")
_LIB = os.path.join(_REPO_ROOT, "native", "libcabac_pack.so")
_lock = threading.Lock()
_lib = None


def _build_library() -> str:
    newest_src = max(os.path.getmtime(_SRC), os.path.getmtime(_SRC_RDOQ))
    if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= newest_src:
        return _LIB
    subprocess.run(
        ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB, _SRC, _SRC_RDOQ],
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
            lib.rdoq_tu.restype = ctypes.c_int
            lib.rdoq_tu.argtypes = [
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_double, ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_int32),
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

    header = struct.pack("<4sBBBBBBBBBII", MAGIC, VERSION,
                         POLICIES.index("regular"), qp, 0,
                         1 if deblocking else 0, 0, 0, 0, n, width, height)
    return header + pack_grid_payload(modes, qcoeffs, n, qp)


def rdoq_tu_native(coeffs: np.ndarray, qp: int, mode: int, lam: float,
                   ctx_states: np.ndarray, cbf_ctx_offset: int,
                   sign_hiding: bool) -> np.ndarray:
    """Native RDOQ for one TU (identical output to codec.rdoq.rdoq_python)."""
    lib = load_library()
    n = coeffs.shape[0]
    coeffs = np.ascontiguousarray(coeffs, dtype=np.int32)
    ctx = np.ascontiguousarray(ctx_states, dtype=np.int32)
    out = np.empty((n, n), dtype=np.int32)
    rc = lib.rdoq_tu(
        coeffs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), n, qp, mode,
        float(lam), ctx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        int(cbf_ctx_offset), 1 if sign_hiding else 0,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    if rc != 0:
        raise RuntimeError(f"rdoq_tu failed with code {rc}")
    return out
