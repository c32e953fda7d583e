"""Rate-distortion optimization: lambda model, SATD, bit counting.

Parity with HM-16.15:
* lambda = 0.57 * 2^((QP-12)/3) for All-Intra (TEncSlice::calculateLambda with
  zero B-frames), sqrt(lambda) for the SATD-based fast pass;
* Hadamard SATD evaluated on 8x8 sub-blocks ((sum+2)>>2) or 4x4 ((sum+1)>>1)
  like TComRdCost::xCalcHADs8x8/4x4;
* candidate counts per PU size from g_aucIntraModeNumFast_UseMPM
  (TComRom.cpp: 8 for 4x4/8x8, 3 for 16-64);
* rate estimation via a counting CABAC (HM FAST_BIT_EST): same context
  transitions as the real encoder, fractional bits from the entropy table.
"""

from __future__ import annotations

import numpy as np

from . import cabac

# g_aucIntraModeNumFast_UseMPM, indexed by log2(size).
NUM_FAST_CANDIDATES = {4: 8, 8: 8, 16: 3, 32: 3, 64: 3}


def lambda_for_qp(qp: int) -> float:
    return 0.57 * (2.0 ** ((qp - 12) / 3.0))


# ------------------------------------------------------------------ SATD ----

def _hadamard(n: int) -> np.ndarray:
    h = np.array([[1]], dtype=np.int64)
    while h.shape[0] < n:
        h = np.block([[h, h], [h, -h]])
    return h


def satd(residuals: np.ndarray) -> np.ndarray:
    """Batched HM-style SATD of (B, n, n) int residuals -> (B,) int64.

    n >= 8 evaluates 8x8 Hadamard sub-blocks; n == 4 the 4x4 Hadamard.
    """
    b, n, _ = residuals.shape
    r = residuals.astype(np.int64)
    if n == 4:
        h = _hadamard(4)
        t = h @ r @ h
        return (np.abs(t).sum(axis=(1, 2)) + 1) >> 1
    h = _hadamard(8)
    blocks = r.reshape(b, n // 8, 8, n // 8, 8).transpose(0, 1, 3, 2, 4).reshape(-1, 8, 8)
    t = h @ blocks @ h
    sums = (np.abs(t).sum(axis=(1, 2)) + 2) >> 2
    return sums.reshape(b, -1).sum(axis=1)


# ----------------------------------------------------------- bit counting ----

class BitCounter:
    """Duck-typed CabacEncoder that counts fractional bits instead of coding.

    Context states advance exactly as in the real engine, so estimates track
    adaptation.  `bits` is in 15-bit fixed point (32768 = 1 bit).
    """

    def __init__(self):
        self.bits = 0

    def encode_bin(self, bin_value: int, ctx: np.ndarray, idx: int):
        state = int(ctx[idx])
        self.bits += int(cabac.ENTROPY_BITS[state ^ bin_value])
        ctx[idx] = (cabac.NEXT_STATE_MPS[state] if bin_value == (state & 1)
                    else cabac.NEXT_STATE_LPS[state])

    def encode_bin_ep(self, bin_value: int):
        self.bits += cabac.EP_BIN_BITS

    def encode_bins_ep(self, bin_values: int, num_bins: int):
        self.bits += cabac.EP_BIN_BITS * num_bins

    def encode_bin_trm(self, bin_value: int):
        self.bits += cabac.EP_BIN_BITS

    @property
    def frac_bits(self) -> float:
        return self.bits / 32768.0
