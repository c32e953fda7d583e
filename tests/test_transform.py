"""Tests for the HEVC integer transforms and quantization."""

import numpy as np
import pytest

from context_adaptive_neural_network_based_prediction_tpu.ops import transform


# HM-16.15 matrices for sizes 4 and 8, written out from the spec constants
# (a,b,c)=(64,83,36); (d..g)=(89,75,50,18) - independent of the generator.
T4_EXPECTED = np.array([
    [64, 64, 64, 64],
    [83, 36, -36, -83],
    [64, -64, -64, 64],
    [36, -83, 83, -36],
])
T8_EXPECTED = np.array([
    [64, 64, 64, 64, 64, 64, 64, 64],
    [89, 75, 50, 18, -18, -50, -75, -89],
    [83, 36, -36, -83, -83, -36, 36, 83],
    [75, -18, -89, -50, 50, 89, 18, -75],
    [64, -64, -64, 64, 64, -64, -64, 64],
    [50, -89, 18, 75, -75, -18, 89, -50],
    [36, -83, 83, -36, -36, 83, -83, 36],
    [18, -50, 75, -89, 89, -75, 50, -18],
])


class TestMatrices:
    def test_t4_t8_exact(self):
        np.testing.assert_array_equal(transform.dct_matrix(4), T4_EXPECTED)
        np.testing.assert_array_equal(transform.dct_matrix(8), T8_EXPECTED)

    @pytest.mark.parametrize("n", [16, 32])
    def test_large_matrices_structure(self, n):
        t = transform.dct_matrix(n)
        # Row 0 constant 64; odd rows antisymmetric; even rows symmetric.
        assert np.all(t[0] == 64)
        for k in range(n):
            sign = -1 if k % 2 else 1
            np.testing.assert_array_equal(t[k, ::-1], sign * t[k])
        # Even rows embed the half-size matrix.
        np.testing.assert_array_equal(t[::2, : n // 2], transform.dct_matrix(n // 2))
        # First angular row holds the documented odd constants in order.
        np.testing.assert_array_equal(t[1, : n // 2], transform._ODD_CONSTS[n])

    @pytest.mark.parametrize("n", [16, 32])
    def test_golden_vs_hm_macro(self, n):
        """Parse the HM TComRom macro text as an oracle for the full matrices."""
        import os
        import re

        path = ("/root/reference/hevc/hm_16_15_regular/source/Lib/TLibCommon/"
                "TComRom.cpp")
        if not os.path.exists(path):
            pytest.skip("reference HM source unavailable")
        src = open(path).read()
        macro = re.search(
            rf"#define DEFINE_DCT{n}x{n}_MATRIX\(([^)]*)\)\s*\\\n\{{(.*?)\n\}}",
            src, re.S)
        letters = [s.strip() for s in macro.group(1).split(",")]
        values = {"a": 64, "b": 83, "c": 36, "d": 89, "e": 75, "f": 50, "g": 18,
                  "h": 90, "i": 87, "j": 80, "k": 70, "l": 57, "m": 43, "n": 25,
                  "o": 9, "p": 90, "q": 90, "r": 88, "s": 85, "t": 82, "u": 78,
                  "v": 73, "w": 67, "x": 61, "y": 54, "z": 46, "A": 38, "B": 31,
                  "C": 22, "D": 13, "E": 4}
        assert set(letters) <= set(values)
        rows = re.findall(r"\{([^{}]*)\}", macro.group(2))
        oracle = np.zeros((n, n), dtype=np.int64)
        for r, row in enumerate(rows):
            entries = [e.strip().rstrip("\\").strip() for e in row.split(",")]
            entries = [e for e in entries if e]
            assert len(entries) == n
            for c, e in enumerate(entries):
                sign = -1 if e.startswith("-") else 1
                oracle[r, c] = sign * values[e.lstrip("-").strip()]
        np.testing.assert_array_equal(transform.dct_matrix(n), oracle)

    @pytest.mark.parametrize("n", [4, 8, 16, 32])
    def test_near_orthogonality(self, n):
        t = transform.dct_matrix(n).astype(np.int64)
        gram = t @ t.T
        diag = np.diag(gram)
        # All rows have (nearly) equal norm ~ n * 64^2.
        assert np.all(np.abs(diag - n * 64 * 64) <= n * 64)
        off = gram - np.diag(diag)
        assert np.abs(off).max() <= 512


class TestTransformRoundtrip:
    @pytest.mark.parametrize("n", [4, 8, 16, 32])
    def test_dct_roundtrip_small_error(self, n):
        rng = np.random.default_rng(n)
        resi = rng.integers(-255, 256, (5, n, n)).astype(np.int32)
        coeff = np.asarray(transform.forward_transform(resi))
        back = np.asarray(transform.inverse_transform(coeff))
        # Without quantization the integer transform pair is near-lossless;
        # HEVC's 16/32 matrices are only near-orthogonal so a few LSBs of
        # error remain on extreme random residuals (HM behaves identically).
        assert np.abs(back - resi).max() <= (1 if n <= 8 else 4)

    def test_dst_roundtrip(self):
        rng = np.random.default_rng(0)
        resi = rng.integers(-255, 256, (5, 4, 4)).astype(np.int32)
        coeff = np.asarray(transform.forward_transform(resi, use_dst=True))
        back = np.asarray(transform.inverse_transform(coeff, use_dst=True))
        assert np.abs(back - resi).max() <= 1

    def test_dc_coefficient_value(self):
        # All-ones 4x4 residual: stage1 -> 128 in col 0, stage2 -> 128 DC.
        resi = np.ones((1, 4, 4), np.int32)
        coeff = np.asarray(transform.forward_transform(resi))
        assert coeff[0, 0, 0] == 128
        assert np.all(coeff[0].reshape(-1)[1:] == 0)

    def test_dst_differs_from_dct(self):
        resi = np.arange(16, dtype=np.int32).reshape(1, 4, 4) - 8
        c_dct = np.asarray(transform.forward_transform(resi))
        c_dst = np.asarray(transform.forward_transform(resi, use_dst=True))
        assert not np.array_equal(c_dct, c_dst)


class TestQuant:
    @pytest.mark.parametrize("qp", [0, 17, 22, 27, 32, 37, 42, 51])
    @pytest.mark.parametrize("n", [4, 8, 16, 32])
    def test_quant_dequant_error_bounded(self, qp, n):
        rng = np.random.default_rng(qp * 100 + n)
        resi = rng.integers(-255, 256, (3, n, n)).astype(np.int32)
        coeff = np.asarray(transform.forward_transform(resi))
        q = np.asarray(transform.quantize(coeff, qp))
        deq = np.asarray(transform.dequantize(q, qp))
        # Quantization step ~ 2^((QP-4)/6) * transform gain; the dequantized
        # coefficient must be within one step of the original.
        step = (2.0 ** ((qp - 4) / 6.0)) * (2 ** (transform.transform_shift(
            int(np.log2(n)))))
        assert np.abs(deq - coeff).max() <= step * 1.1 + 1

    def test_quant_zero_at_high_qp(self):
        # Tiny residual at QP 51 quantizes to all-zero.
        resi = np.ones((1, 8, 8), np.int32)
        coeff = np.asarray(transform.forward_transform(resi))
        q = np.asarray(transform.quantize(coeff, 51))
        assert np.all(q == 0)

    def test_quant_rounding_offset_intra(self):
        # The I-slice offset 171/512 rounds up just below the 2/3 point.
        coeff = np.full((1, 4, 4), 0, np.int32)
        coeff[0, 0, 0] = 100
        q_intra = np.asarray(transform.quantize(coeff, 22, is_intra_slice=True))
        q_inter = np.asarray(transform.quantize(coeff, 22, is_intra_slice=False))
        assert q_intra[0, 0, 0] >= q_inter[0, 0, 0]

    def test_sign_symmetry(self):
        rng = np.random.default_rng(1)
        coeff = rng.integers(-1000, 1000, (2, 8, 8)).astype(np.int32)
        q_pos = np.asarray(transform.quantize(coeff, 30))
        q_neg = np.asarray(transform.quantize(-coeff, 30))
        np.testing.assert_array_equal(q_pos, -q_neg)

    @pytest.mark.parametrize("qp", [10, 37])
    def test_full_pipeline_psnr_reasonable(self, qp):
        # transform -> quant -> dequant -> inverse on a natural-ish signal.
        rng = np.random.default_rng(2)
        base = rng.integers(0, 256, (1, 8, 8)).astype(np.float64)
        smooth = np.asarray(np.round(
            (base + np.roll(base, 1, 1) + np.roll(base, 1, 2)) / 3), np.int32)
        resi = smooth - 128
        coeff = np.asarray(transform.forward_transform(resi))
        q = np.asarray(transform.quantize(coeff, qp))
        rec = np.asarray(transform.inverse_transform(
            np.asarray(transform.dequantize(q, qp))))
        err_lo = np.abs(rec - resi).max()
        if qp == 10:
            assert err_lo <= 3
        else:
            # QP 37 quantizer step ~ 2^((37-4)/6) ~ 45 in the pixel domain.
            assert err_lo <= 90
