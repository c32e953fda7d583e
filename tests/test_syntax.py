"""Roundtrip tests for scan orders, MPM, mode coding and residual coding."""

import numpy as np
import pytest

from context_adaptive_neural_network_based_prediction_tpu.codec import (
    cabac, contexts, scans, syntax)


class TestScans:
    def test_diag_4x4_spec_order(self):
        # Rec. ITU-T H.265 6.5.3 up-right diagonal scan.
        expected_xy = [(0, 0), (0, 1), (1, 0), (0, 2), (1, 1), (2, 0),
                       (0, 3), (1, 2), (2, 1), (3, 0), (1, 3), (2, 2),
                       (3, 1), (2, 3), (3, 2), (3, 3)]
        scan = scans.scan_order(4, 4, scans.SCAN_DIAG)
        got = [(int(r) % 4, int(r) // 4) for r in scan]
        assert got == expected_xy

    def test_scan_is_permutation(self):
        for n in (4, 8, 16, 32):
            for st in (scans.SCAN_DIAG, scans.SCAN_HOR, scans.SCAN_VER):
                scan = scans.scan_order(n, n, st)
                assert sorted(scan.tolist()) == list(range(n * n))

    def test_grouped_scan_stays_in_cg(self):
        scan = scans.scan_order(8, 8, scans.SCAN_DIAG)
        # Positions 0-15 must all lie in the DC coefficient group (4x4 at 0,0).
        for p in scan[:16]:
            y, x = divmod(int(p), 8)
            assert x < 4 and y < 4

    def test_mode_dependent_selection(self):
        assert scans.select_scan(26, 8) == scans.SCAN_HOR
        assert scans.select_scan(10, 4) == scans.SCAN_VER
        assert scans.select_scan(0, 8) == scans.SCAN_DIAG
        assert scans.select_scan(26, 16) == scans.SCAN_DIAG  # too large for MDCS
        assert scans.select_scan(22, 8) == scans.SCAN_HOR
        assert scans.select_scan(31, 8) == scans.SCAN_DIAG


class TestMPM:
    def test_same_angular(self):
        assert syntax.mpm_candidates(20, 20) == [20, 19, 21]
        assert syntax.mpm_candidates(2, 2) == [2, 33, 3]
        assert syntax.mpm_candidates(34, 34) == [34, 33, 3]

    def test_same_nonangular(self):
        assert syntax.mpm_candidates(0, 0) == [0, 1, 26]
        assert syntax.mpm_candidates(1, 1) == [0, 1, 26]

    def test_different(self):
        assert syntax.mpm_candidates(0, 1) == [0, 1, 26]
        assert syntax.mpm_candidates(10, 26) == [10, 26, 0]
        assert syntax.mpm_candidates(0, 26) == [0, 26, 1]


class TestModeCoding:
    @pytest.mark.parametrize("mode", list(range(35)))
    def test_roundtrip_all_modes(self, mode):
        for mpms in ([0, 1, 26], [20, 19, 21], [10, 26, 0]):
            enc_ctx = contexts.make_context_states(32)
            dec_ctx = contexts.make_context_states(32)
            enc = cabac.CabacEncoder()
            syntax.encode_intra_mode(enc, enc_ctx, mode, mpms)
            data = enc.terminate_and_finish()
            dec = cabac.CabacDecoder(data)
            assert syntax.decode_intra_mode(dec, dec_ctx, mpms) == mode


class TestResidualCoding:
    def roundtrip(self, coeffs, mode=0, sign_hiding=False, qp=32):
        n = coeffs.shape[0]
        enc_ctx = contexts.make_context_states(qp)
        dec_ctx = contexts.make_context_states(qp)
        enc = cabac.CabacEncoder()
        syntax.encode_coefficients(enc, enc_ctx, coeffs, mode, sign_hiding)
        data = enc.terminate_and_finish()
        dec = cabac.CabacDecoder(data)
        out = syntax.decode_coefficients(dec, dec_ctx, n, mode, sign_hiding)
        np.testing.assert_array_equal(coeffs, out)
        np.testing.assert_array_equal(enc_ctx, dec_ctx)
        return data

    @pytest.mark.parametrize("n", [4, 8, 16, 32])
    def test_single_dc(self, n):
        coeffs = np.zeros((n, n), np.int32)
        coeffs[0, 0] = 5
        self.roundtrip(coeffs)

    @pytest.mark.parametrize("n", [4, 8, 16, 32])
    @pytest.mark.parametrize("mode", [0, 10, 26])
    def test_random_sparse(self, n, mode):
        rng = np.random.default_rng(n * 37 + mode)
        coeffs = np.zeros((n, n), np.int32)
        n_nz = max(1, n * n // 8)
        idx = rng.choice(n * n, n_nz, replace=False)
        coeffs.reshape(-1)[idx] = rng.integers(-100, 100, n_nz)
        if not coeffs.any():
            coeffs[0, 0] = 1
        self.roundtrip(coeffs, mode)

    @pytest.mark.parametrize("n", [4, 8, 16])
    def test_dense_large_values(self, n):
        rng = np.random.default_rng(n)
        coeffs = rng.integers(-3000, 3000, (n, n)).astype(np.int32)
        coeffs[0, 0] = 32000
        self.roundtrip(coeffs)

    def test_single_coefficient_positions(self):
        for n in (4, 8, 16, 32):
            for pos in (0, 1, n - 1, n * n - 1, n * (n - 1)):
                coeffs = np.zeros((n, n), np.int32)
                coeffs.reshape(-1)[pos] = -7
                self.roundtrip(coeffs)

    def test_values_one_only(self):
        # All-ones exercises the no-escape path.
        coeffs = np.zeros((8, 8), np.int32)
        coeffs[0, :3] = 1
        coeffs[1, 0] = -1
        self.roundtrip(coeffs)

    def test_gt2_boundary_values(self):
        for v in (1, 2, 3, 4, 5, 9, 12, 13):
            coeffs = np.zeros((4, 4), np.int32)
            coeffs[0, 0] = v
            coeffs[1, 1] = 2
            self.roundtrip(coeffs)

    def test_many_nonzero_exceeds_c1flag_number(self):
        rng = np.random.default_rng(5)
        coeffs = rng.integers(1, 40, (4, 4)).astype(np.int32)
        coeffs *= rng.choice([-1, 1], (4, 4))
        self.roundtrip(coeffs)

    def test_sign_hiding_roundtrip(self):
        # Craft CGs whose first/last nonzero span >= 4 so signs hide; the
        # encoder relies on the quantizer ensuring sign parity, so build a
        # block whose hidden sign is consistent by construction.
        coeffs = np.zeros((8, 8), np.int32)
        scan = scans.scan_order(8, 8, scans.SCAN_DIAG)
        # Nonzeros at scan positions 0 and 6 of the first CG.
        coeffs.reshape(-1)[scan[0]] = 4   # even sum, first-in-scan sign + -> hidden ok
        coeffs.reshape(-1)[scan[6]] = 2
        self.roundtrip(coeffs, sign_hiding=True)

    def test_compression_is_effective(self):
        # A typical quantized TU must cost far fewer bits than raw.
        coeffs = np.zeros((16, 16), np.int32)
        coeffs[0, 0] = 12
        coeffs[0, 1] = -3
        coeffs[1, 0] = 2
        coeffs[2, 1] = 1
        data = self.roundtrip(coeffs)
        assert len(data) < 12
