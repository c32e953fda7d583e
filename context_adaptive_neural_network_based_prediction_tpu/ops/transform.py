"""HEVC integer transforms (DCT-II 4-32, DST-VII 4) and scalar quantization.

Semantic parity with HM-16.15 `TComTrQuant.cpp` (`xTrMxN:862`,
`xITrMxN`, `xQuant:1126`, `xDeQuant:1309`) for 8-bit, square TUs, no scaling
lists:

* forward: two matrix stages with rounding shifts.  The reference HM build
  has `RExt__HIGH_BIT_DEPTH_SUPPORT=1` (TypeDef.h:127), which makes the
  ENCODER-side forward transform use the 14-bit high-precision matrices
  (TComRom.cpp:441-468, `g_aiT*[TRANSFORM_FORWARD]`) with
  shift_1st = log2(N) + bitDepth + 14 - 15, shift_2nd = log2(N) + 14, while
  the inverse keeps the normative 6-bit matrices.  Matching this matters:
  with the 6-bit forward our quantizer sees coefficients off by a few units,
  which flips marginal RDOQ/sign-hiding decisions and compounds through the
  intra prediction chain (measured ~1% lambda-cost loss vs HM);
* inverse: shift_1st = 7 with clip to +-2^15, shift_2nd = 20 - bitDepth;
* quant:   q = sign * ((|c| * quantScale[QP%6] + round) >> (14 + QP/6 + tshift))
  with round = 171 << (qbits - 9) for I slices and tshift = 15 - bitDepth -
  log2(N); dequant: rightShift = 6 - (tshift + QP/6), c = (q * invScale[QP%6]
  +- round) >> rightShift (left shift if negative), clipped to +-2^15.

The transform matrices are *generated*, not transcribed: row 0 is the constant
64 row; even rows recurse from the half-size matrix via the DCT symmetry
T[k][N-1-n] = (-1)^k T[k][n]; odd rows follow the cosine phase-folding rule
over the per-size odd-constant lists of the HEVC spec (the only hand-tuned
numbers).  A self-test asserts near-orthogonality.

Everything is batched over a leading block axis and jit-compatible: two
(B, N, N) x (N, N) matmuls per stage - MXU work - plus VPU shifts/clips.
"""

from __future__ import annotations

import functools

import numpy as np

BIT_DEPTH = 8
MAX_TR_DYNAMIC_RANGE = 15
QUANT_SHIFT = 14
IQUANT_SHIFT = 6
TRANSFORM_MATRIX_SHIFT = 6
QUANT_SCALES = (26214, 23302, 20560, 18396, 16384, 14564)
INV_QUANT_SCALES = (40, 45, 51, 57, 64, 72)

# Forward-transform matrix shift of the high-precision matrices
# (HM TComRom.h g_transformMatrixShift[TRANSFORM_FORWARD] under
# RExt__HIGH_BIT_DEPTH_SUPPORT; the inverse stays at 6).
FWD_MATRIX_SHIFT = 14

# Hand-tuned odd-row constants of the HEVC spec integer DCT, per size.
_ODD_CONSTS = {
    4: (83, 36),
    8: (89, 75, 50, 18),
    16: (90, 87, 80, 70, 57, 43, 25, 9),
    32: (90, 90, 88, 85, 82, 78, 73, 67, 61, 54, 46, 38, 31, 22, 13, 4),
}

# 14-bit high-precision forward-transform constants (TComRom.cpp:441-462).
_ODD_CONSTS_HP = {
    4: (21266, 9224),
    8: (22813, 19244, 12769, 4563),
    16: (23120, 22063, 20450, 17972, 14642, 11109, 6446, 2316),
    32: (23106, 22852, 22445, 21848, 20995, 19810, 18601, 17143,
         15718, 13853, 11749, 9846, 7908, 5573, 3281, 946),
}

# HEVC DST-VII 4x4 (luma intra 4x4 TUs), 6-bit (inverse/normative) and the
# 14-bit forward pair (g_as_DST_MAT_4, TComRom.cpp:464-468).
DST4 = np.array([
    [29, 55, 74, 84],
    [74, 74, 0, -74],
    [84, -29, -74, 55],
    [55, -84, 74, -29],
], dtype=np.int32)

DST4_FWD = np.array([
    [7424, 14081, 18893, 21505],
    [18893, 18893, 0, -18893],
    [21505, -7424, -18893, 14081],
    [14081, -21505, 18893, -7424],
], dtype=np.int32)


@functools.lru_cache(maxsize=None)
def dct_matrix(n: int, high_precision: bool = False) -> np.ndarray:
    """The HEVC integer DCT-II matrix of size n (4, 8, 16 or 32)."""
    if n == 2:
        base = 16384 if high_precision else 64
        return np.array([[base, base], [base, -base]], dtype=np.int64)
    half = dct_matrix(n // 2, high_precision)
    t = np.zeros((n, n), dtype=np.int64)
    # Even rows: half-size rows mirrored (T[2m][N-1-n] = T[2m][n]).
    for m in range(n // 2):
        t[2 * m, : n // 2] = half[m]
        t[2 * m, n // 2:] = half[m][::-1]
    # Odd rows: cosine phase folding over the odd-constant list.
    odd = (_ODD_CONSTS_HP if high_precision else _ODD_CONSTS)[n]
    for k in range(1, n, 2):
        for col in range(n):
            p = (k * (2 * col + 1)) % (4 * n)
            q = min(p, 4 * n - p)          # fold to [0, 2n]
            if q <= n:
                t[k, col] = odd[(q - 1) // 2]
            else:
                t[k, col] = -odd[(2 * n - q - 1) // 2]
    return t


def _self_test_matrices():
    for n in (4, 8, 16, 32):
        t = dct_matrix(n)
        gram = t @ t.T
        off = gram - np.diag(np.diag(gram))
        # HEVC matrices are near-orthogonal: off-diagonal energy is tiny.
        assert np.abs(off).max() <= 512, f"DCT{n} generation broken"
        t_hp = dct_matrix(n, True)
        gram = t_hp @ t_hp.T
        off = gram - np.diag(np.diag(gram))
        # Relative near-orthogonality (entries are ~2^8 larger, so gram
        # deviations scale by ~2^16).
        assert np.abs(off).max() <= gram[0, 0] * 0.01, \
            f"DCT{n} HP generation broken"


_self_test_matrices()


def transform_shift(log2_n: int, bit_depth: int = BIT_DEPTH) -> int:
    return MAX_TR_DYNAMIC_RANGE - bit_depth - log2_n


@functools.lru_cache(maxsize=None)
def _jitted_fwd(n: int, use_dst: bool, bit_depth: int):
    import jax
    import jax.numpy as jnp

    log2n = n.bit_length() - 1
    t_np = (DST4_FWD if use_dst
            else np.asarray(dct_matrix(n, True), np.int32))
    shift1 = log2n + bit_depth + FWD_MATRIX_SHIFT - MAX_TR_DYNAMIC_RANGE
    shift2 = log2n + FWD_MATRIX_SHIFT
    add1 = (1 << (shift1 - 1)) if shift1 > 0 else 0
    add2 = 1 << (shift2 - 1)

    def fwd(resi):
        t = jnp.asarray(t_np)
        r = resi.astype(jnp.int32)
        # Stage 1 along width: A[b, i, k] = (sum_n R[b,i,n] T[k,n] + add) >> s1.
        # |r| <= 2^9, |T| < 2^15, N <= 32 -> |sum| < 2^29: int32-safe.
        a = (jnp.einsum("bin,kn->bik", r, t) + add1) >> shift1
        # Stage 2 along height.  |a| can reach ~2^16, so a single int32
        # accumulation would overflow (JAX has no int64 without x64); split
        # a = hi*256 + lo and recombine under the shift, exactly:
        # (hi_sum*2^8 + lo_sum + add) >> s2 == (hi_sum + (lo_sum+add >> 8))
        # >> (s2-8), since s2 = log2n+14 >= 16 > 8 and floor-shifts compose.
        hi = a >> 8
        lo = a & 255
        hi_sum = jnp.einsum("ki,bil->bkl", t, hi)
        lo_sum = jnp.einsum("ki,bil->bkl", t, lo)
        c = (hi_sum + ((lo_sum + add2) >> 8)) >> (shift2 - 8)
        return c

    return jax.jit(fwd)


@functools.lru_cache(maxsize=None)
def _jitted_inv(n: int, use_dst: bool, bit_depth: int):
    import jax
    import jax.numpy as jnp

    t_np = DST4 if use_dst else np.asarray(dct_matrix(n), np.int32)
    shift1 = TRANSFORM_MATRIX_SHIFT + 1
    shift2 = (TRANSFORM_MATRIX_SHIFT + MAX_TR_DYNAMIC_RANGE - 1) - bit_depth
    add1 = 1 << (shift1 - 1)
    add2 = (1 << (shift2 - 1)) if shift2 > 0 else 0
    clip_lo, clip_hi = -(1 << MAX_TR_DYNAMIC_RANGE), (1 << MAX_TR_DYNAMIC_RANGE) - 1
    pel_lo, pel_hi = -32768, 32767  # HM Pel = Short

    def inv(coeff):
        t = jnp.asarray(t_np)
        c = coeff.astype(jnp.int32)
        # Stage 1 over height: E[b, i, l] = (sum_k T[k,i] C[b,k,l] + add) >> s1.
        e = (jnp.einsum("ki,bkl->bil", t, c) + add1) >> shift1
        e = jnp.clip(e, clip_lo, clip_hi)
        # Stage 2 over width: R[b, i, n] = (sum_k E[b,i,k] T[k,n] + add) >> s2.
        r = (jnp.einsum("bik,kn->bin", e, t) + add2) >> shift2
        return jnp.clip(r, pel_lo, pel_hi)

    return jax.jit(inv)


def forward_transform(residuals, *, use_dst: bool = False, bit_depth: int = BIT_DEPTH):
    """Batched forward transform: (B, N, N) int residuals -> (B, N, N) int32 coeffs.

    `use_dst` selects the DST-VII (HM: luma intra 4x4 TUs only).
    """
    n = residuals.shape[-1]
    if use_dst and n != 4:
        raise ValueError("DST only applies to 4x4 TUs.")
    return _jitted_fwd(n, use_dst, bit_depth)(residuals)


def inverse_transform(coeffs, *, use_dst: bool = False, bit_depth: int = BIT_DEPTH):
    """Batched inverse transform: (B, N, N) int32 coeffs -> (B, N, N) int32 residuals."""
    n = coeffs.shape[-1]
    if use_dst and n != 4:
        raise ValueError("DST only applies to 4x4 TUs.")
    return _jitted_inv(n, use_dst, bit_depth)(coeffs)


@functools.lru_cache(maxsize=None)
def _jitted_quant(n: int, qp: int, is_intra_slice: bool, bit_depth: int):
    import jax
    import jax.numpy as jnp

    log2n = n.bit_length() - 1
    per, rem = qp // 6, qp % 6
    tshift = transform_shift(log2n, bit_depth)
    qbits = QUANT_SHIFT + per + tshift
    add = (171 if is_intra_slice else 85) << (qbits - 9)
    scale = QUANT_SCALES[rem]
    lo, hi = -(1 << MAX_TR_DYNAMIC_RANGE), (1 << MAX_TR_DYNAMIC_RANGE) - 1

    def quant(coeffs):
        c = coeffs.astype(jnp.int64)
        mag = (jnp.abs(c) * scale + add) >> qbits
        q = jnp.sign(c) * mag
        return jnp.clip(q, lo, hi).astype(jnp.int32)

    return jax.jit(quant)


@functools.lru_cache(maxsize=None)
def _jitted_dequant(n: int, qp: int, bit_depth: int):
    import jax
    import jax.numpy as jnp

    log2n = n.bit_length() - 1
    per, rem = qp // 6, qp % 6
    tshift = transform_shift(log2n, bit_depth)
    right_shift = IQUANT_SHIFT - (tshift + per)
    scale = INV_QUANT_SCALES[rem]
    lo, hi = -(1 << MAX_TR_DYNAMIC_RANGE), (1 << MAX_TR_DYNAMIC_RANGE) - 1

    def dequant(q):
        qq = q.astype(jnp.int32)
        if right_shift > 0:
            add = 1 << (right_shift - 1)
            c = (qq * scale + add) >> right_shift
        else:
            c = (qq * scale) << (-right_shift)
        return jnp.clip(c, lo, hi)

    return jax.jit(dequant)


def forward_transform_np(residuals: np.ndarray, *, use_dst: bool = False,
                         bit_depth: int = BIT_DEPTH) -> np.ndarray:
    """Numpy twin of `forward_transform` (identical integer semantics)."""
    n = residuals.shape[-1]
    log2n = n.bit_length() - 1
    t = (DST4_FWD if use_dst
         else np.asarray(dct_matrix(n, True), np.int32)).astype(np.int64)
    shift1 = log2n + bit_depth + FWD_MATRIX_SHIFT - MAX_TR_DYNAMIC_RANGE
    shift2 = log2n + FWD_MATRIX_SHIFT
    add1 = (1 << (shift1 - 1)) if shift1 > 0 else 0
    add2 = 1 << (shift2 - 1)
    r = residuals.astype(np.int64)
    a = (np.einsum("bin,kn->bik", r, t) + add1) >> shift1
    return (((np.einsum("ki,bil->bkl", t, a) + add2) >> shift2)).astype(np.int32)


def inverse_transform_np(coeffs: np.ndarray, *, use_dst: bool = False,
                         bit_depth: int = BIT_DEPTH) -> np.ndarray:
    """Numpy twin of `inverse_transform`."""
    n = coeffs.shape[-1]
    t = (DST4 if use_dst else np.asarray(dct_matrix(n), np.int32)).astype(np.int64)
    shift1 = TRANSFORM_MATRIX_SHIFT + 1
    shift2 = (TRANSFORM_MATRIX_SHIFT + MAX_TR_DYNAMIC_RANGE - 1) - bit_depth
    add1 = 1 << (shift1 - 1)
    add2 = (1 << (shift2 - 1)) if shift2 > 0 else 0
    lo, hi = -(1 << MAX_TR_DYNAMIC_RANGE), (1 << MAX_TR_DYNAMIC_RANGE) - 1
    c = coeffs.astype(np.int64)
    e = np.clip((np.einsum("ki,bkl->bil", t, c) + add1) >> shift1, lo, hi)
    r = (np.einsum("bik,kn->bin", e, t) + add2) >> shift2
    return np.clip(r, -32768, 32767).astype(np.int32)


def quantize_np(coeffs: np.ndarray, qp: int, *, is_intra_slice: bool = True,
                bit_depth: int = BIT_DEPTH) -> np.ndarray:
    """Numpy twin of `quantize`."""
    n = coeffs.shape[-1]
    log2n = n.bit_length() - 1
    per, rem = qp // 6, qp % 6
    qbits = QUANT_SHIFT + per + transform_shift(log2n, bit_depth)
    add = (171 if is_intra_slice else 85) << (qbits - 9)
    scale = QUANT_SCALES[rem]
    c = coeffs.astype(np.int64)
    mag = (np.abs(c) * scale + add) >> qbits
    q = np.sign(c) * mag
    lo, hi = -(1 << MAX_TR_DYNAMIC_RANGE), (1 << MAX_TR_DYNAMIC_RANGE) - 1
    return np.clip(q, lo, hi).astype(np.int32)


def dequantize_np(qcoeffs: np.ndarray, qp: int, *, bit_depth: int = BIT_DEPTH) -> np.ndarray:
    """Numpy twin of `dequantize`."""
    n = qcoeffs.shape[-1]
    log2n = n.bit_length() - 1
    per, rem = qp // 6, qp % 6
    right_shift = IQUANT_SHIFT - (transform_shift(log2n, bit_depth) + per)
    scale = INV_QUANT_SCALES[rem]
    q = qcoeffs.astype(np.int64)
    if right_shift > 0:
        c = (q * scale + (1 << (right_shift - 1))) >> right_shift
    else:
        c = (q * scale) << (-right_shift)
    lo, hi = -(1 << MAX_TR_DYNAMIC_RANGE), (1 << MAX_TR_DYNAMIC_RANGE) - 1
    return np.clip(c, lo, hi).astype(np.int32)


def quantize(coeffs, qp: int, *, is_intra_slice: bool = True, bit_depth: int = BIT_DEPTH):
    """HM scalar quantization (non-RDOQ path) of (B, N, N) coefficients."""
    return _jitted_quant(coeffs.shape[-1], qp, is_intra_slice, bit_depth)(coeffs)


def dequantize(qcoeffs, qp: int, *, bit_depth: int = BIT_DEPTH):
    """HM dequantization of (B, N, N) quantized levels."""
    return _jitted_dequant(qcoeffs.shape[-1], qp, bit_depth)(qcoeffs)
