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
_SRC_PARSE = os.path.join(_REPO_ROOT, "native", "hm_parse.cpp")
_LIB = os.path.join(_REPO_ROOT, "native", "libcabac_pack.so")
_lock = threading.Lock()
_lib = None


def _build_library() -> str:
    sources = [_SRC, _SRC_RDOQ, _SRC_PARSE]
    newest_src = max(os.path.getmtime(s) for s in sources)
    if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= newest_src:
        return _LIB
    subprocess.run(
        ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB] + sources,
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
            lib.hm_decode_slice.restype = ctypes.c_int64
            i32p = ctypes.POINTER(ctypes.c_int32)
            lib.hm_decode_slice.argtypes = (
                [ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64]
                + [ctypes.c_int] * 18
                + [i32p] * 6 + [ctypes.c_int64, i32p, ctypes.c_int64, i32p,
                                ctypes.POINTER(ctypes.c_int64)])
            lib.deblock_luma_native.restype = ctypes.c_int
            lib.deblock_luma_native.argtypes = [
                i32p, ctypes.c_int, ctypes.c_int, i32p, ctypes.c_int,
                ctypes.c_int]
            lib.deblock_chroma_native.restype = ctypes.c_int
            lib.deblock_chroma_native.argtypes = [
                i32p, ctypes.c_int, ctypes.c_int, i32p, ctypes.c_int,
                ctypes.c_int]
            lib.pack_tree_grids.restype = ctypes.c_int64
            lib.pack_tree_grids.argtypes = (
                [ctypes.POINTER(ctypes.c_int32)] * 14
                + [ctypes.c_int32] * 6
                + [ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64])
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


def pack_tree_payload(grids, *, width: int, height: int, qp: int,
                      ctu_size: int, policy: str,
                      sign_hiding: bool = True) -> bytes:
    """CABAC payload for a wavefront2 decided-grid frame (no header).

    `grids` is the `_assemble_arrays` tuple (m8, q8, s8, m4, q4, m16, q16,
    s16, m32, q32, s32[, m64, q64, s64]).  Byte-identical to
    `encoder.serialize_trees` over the equivalent CuNode trees — the native
    packer walks the grids directly, taking the per-frame Python
    serializer (2.5 s/frame of pure-Python CABAC at 1080p) off the encode
    pipeline's critical path."""
    import ctypes as ct

    lib = load_library()
    if len(grids) == 11:
        (m8, q8, s8, m4, q4, m16, q16, s16, m32, q32, s32) = grids
        m64 = q64 = s64 = None
    else:
        (m8, q8, s8, m4, q4, m16, q16, s16, m32, q32, s32,
         m64, q64, s64) = grids

    def p(a):
        if a is None:
            return ct.POINTER(ct.c_int32)()
        a = np.ascontiguousarray(a, dtype=np.int32)
        _keep.append(a)
        return a.ctypes.data_as(ct.POINTER(ct.c_int32))

    _keep = []
    cap = max(width * height * 4, 1 << 16)
    out = np.empty(cap, dtype=np.uint8)
    size = lib.pack_tree_grids(
        p(m4), p(q4), p(m8), p(q8), p(s8), p(m16), p(q16), p(s16),
        p(m32), p(q32), p(s32), p(m64), p(q64), p(s64),
        width, height, qp, ctu_size,
        {"regular": 0, "substitution": 1, "switch": 2}[policy],
        1 if sign_hiding else 0,
        out.ctypes.data_as(ct.POINTER(ct.c_uint8)), cap)
    if size < 0:
        raise RuntimeError(f"pack_tree_grids failed with code {size}")
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


def hm_decode_slice_native(slice_data: bytes, *, width: int, height: int,
                           ctu_size: int, log2_min_cb: int, log2_max_tb: int,
                           log2_min_tb: int, max_tr_depth_intra: int,
                           chroma: bool, qp: int, qp_cb: int = 0,
                           qp_cr: int = 0, transform_skip_enabled: bool = True,
                           sign_data_hiding: bool = True,
                           sao_luma: bool = False, sao_chroma: bool = False,
                           strong_intra_smoothing: bool = True,
                           policy: int = 0, reconstruct: bool = True) -> dict:
    """Parses (and for policy 0 optionally reconstructs) one I-slice natively.

    Returns a dict with: recon_y/cb/cr (int32 planes or None), mode_map,
    tu_map ((H+3)//4 x (W+3)//4 int32), tu_meta ((n_tu, 8) int32 records
    [plane, x, y, n, mode, cbf, tskip, coef_off]), coeffs (flat int32), and
    sao ((n_ctu, 3, 6) int32 [mode, aux, o0..o3] per component).
    """
    lib = load_library()
    i32p = ctypes.POINTER(ctypes.c_int32)

    data = np.frombuffer(slice_data, dtype=np.uint8)
    uh, uw = (height + 3) // 4, (width + 3) // 4
    n_ctu = ((height + ctu_size - 1) // ctu_size) * \
        ((width + ctu_size - 1) // ctu_size)

    recon_y = np.zeros((height, width), dtype=np.int32)
    cw, chh = width // 2, height // 2
    recon_cb = np.zeros((chh, cw), dtype=np.int32) if chroma else \
        np.zeros((1, 1), dtype=np.int32)
    recon_cr = np.zeros_like(recon_cb)
    mode_map = np.empty((uh, uw), dtype=np.int32)
    tu_map = np.empty((uh, uw), dtype=np.int32)
    tu_meta_cap = (width * height) // 8 + 4096
    tu_meta = np.empty((tu_meta_cap, 8), dtype=np.int32)
    coeff_cap = width * height * 2 + 4096
    coeff_buf = np.empty(coeff_cap, dtype=np.int32)
    sao_out = np.zeros((n_ctu, 3, 6), dtype=np.int32)
    counts = np.zeros(2, dtype=np.int64)

    def p(a):
        return a.ctypes.data_as(i32p)

    rc = lib.hm_decode_slice(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(data),
        width, height, ctu_size, log2_min_cb, log2_max_tb, log2_min_tb,
        max_tr_depth_intra, 1 if chroma else 0, qp, qp_cb, qp_cr,
        1 if transform_skip_enabled else 0, 1 if sign_data_hiding else 0,
        1 if sao_luma else 0, 1 if sao_chroma else 0,
        1 if strong_intra_smoothing else 0, int(policy),
        1 if reconstruct else 0,
        p(recon_y), p(recon_cb), p(recon_cr), p(mode_map), p(tu_map),
        p(tu_meta), tu_meta_cap, p(coeff_buf), coeff_cap, p(sao_out),
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    if rc != 0:
        raise RuntimeError(f"hm_decode_slice failed with code {rc}")
    n_tu, n_coeff = int(counts[0]), int(counts[1])
    return {
        "recon_y": recon_y if reconstruct else None,
        "recon_cb": recon_cb if (reconstruct and chroma) else None,
        "recon_cr": recon_cr if (reconstruct and chroma) else None,
        "mode_map": mode_map,
        "tu_map": tu_map,
        "tu_meta": tu_meta[:n_tu].copy(),
        "coeffs": coeff_buf[:n_coeff].copy(),
        "sao": sao_out,
    }


def deblock_native(plane: np.ndarray, tu_map: np.ndarray, qp: int,
                   *, chroma: bool) -> np.ndarray:
    """Native HM deblocking (same output as codec.deblock.deblock_{luma,chroma})."""
    lib = load_library()
    i32p = ctypes.POINTER(ctypes.c_int32)
    out = np.ascontiguousarray(plane, dtype=np.int32)
    if out is plane:
        out = out.copy()
    tu = np.ascontiguousarray(tu_map, dtype=np.int32)
    h, w = out.shape
    fn = lib.deblock_chroma_native if chroma else lib.deblock_luma_native
    rc = fn(out.ctypes.data_as(i32p), h, w, tu.ctypes.data_as(i32p),
            tu.shape[1], int(qp))
    if rc != 0:
        raise RuntimeError(f"deblock_native failed with code {rc}")
    return out.astype(plane.dtype)


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
