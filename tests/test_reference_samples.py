"""Tests for intra reference-sample fill/filter rules."""

import numpy as np
import pytest

from context_adaptive_neural_network_based_prediction_tpu.ops import reference_samples as rs


def make_recon(h=64, w=64, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w)).astype(np.int32)


class TestAvailability:
    def test_all_available_interior(self):
        recon = make_recon()
        coded = np.ones((16, 16), bool)
        flags = rs.neighbor_unit_flags(coded, 16, 16, 8, 64, 64)
        assert flags.all()
        ref_top, ref_left = rs.fill_reference_samples(recon, 16, 16, 8, flags)
        assert ref_top[0] == recon[15, 15]
        np.testing.assert_array_equal(ref_top[1:], recon[15, 16:32])
        np.testing.assert_array_equal(ref_left[1:], recon[16:32, 15])

    def test_none_available_fills_dc(self):
        recon = make_recon()
        coded = np.zeros((16, 16), bool)
        flags = rs.neighbor_unit_flags(coded, 0, 0, 8, 64, 64)
        assert not flags.any()
        ref_top, ref_left = rs.fill_reference_samples(recon, 0, 0, 8, flags)
        assert np.all(ref_top == 128) and np.all(ref_left == 128)

    def test_frame_edge_units_unavailable(self):
        coded = np.ones((16, 16), bool)
        # Top-left block: nothing above or left.
        flags = rs.neighbor_unit_flags(coded, 0, 0, 8, 64, 64)
        assert not flags.any()
        # Top row block: left available, above not.
        flags = rs.neighbor_unit_flags(coded, 8, 0, 8, 64, 64)
        n_units = 4
        assert flags[:n_units].any() and not flags[n_units:].any()

    def test_below_left_gated_by_coded_mask(self):
        # Raster coding order: below-left not yet reconstructed.
        coded = np.zeros((16, 16), bool)
        coded[:4, :] = True   # rows 0-15 coded
        coded[4, :4] = True   # row 16-19, cols 0-15 coded
        flags = rs.neighbor_unit_flags(coded, 16, 16, 8, 64, 64)
        n_units = 4
        # Flag order is bottom-to-top: units at rows 28-31, 24-27, 20-23 are
        # not yet coded; only rows 16-19 (flags[3]) are.
        assert not flags[0] and not flags[1] and not flags[2]
        assert flags[3]
        assert flags[n_units]  # corner
        assert flags[n_units + 1:].all()  # above & above-right row 15


class TestPadding:
    def test_padding_replicates_from_first_valid(self):
        recon = make_recon()
        coded = np.zeros((16, 16), bool)
        coded[:2, :] = True  # only first 8 rows coded
        # Block at (8, 8): above available; left column x=7 rows 8.. not coded.
        flags = rs.neighbor_unit_flags(coded, 8, 8, 8, 64, 64)
        ref_top, ref_left = rs.fill_reference_samples(recon, 8, 8, 8, flags)
        np.testing.assert_array_equal(ref_top[1:], recon[7, 8:24])
        assert ref_top[0] == recon[7, 7]
        # Left column replicates the corner (first valid sample scanning up).
        assert np.all(ref_left[1:] == recon[7, 7])

    def test_gap_between_valid_units(self):
        recon = make_recon()
        coded = np.ones((16, 16), bool)
        coded[3, 3] = False  # a hole below-left of block at (16, 12)? craft simpler:
        # Block at (16,16; below-left rows 24-31 col 15 in units (6,3),(7,3).
        coded[6, 3] = False
        flags = rs.neighbor_unit_flags(coded, 16, 16, 8, 64, 64)
        assert not flags[1]  # second-from-bottom below-left unit invalid
        ref_top, ref_left = rs.fill_reference_samples(recon, 16, 16, 8, flags)
        # The invalid unit (left rows 24..27 -> ref_left[9..12]) replicates the
        # last sample of the unit before it in line order (bottom-to-top:
        # previous unit is rows 28..31, its last line sample is row 28).
        np.testing.assert_array_equal(ref_left[1:9], recon[16:24, 15])
        assert np.all(ref_left[9:13] == recon[28, 15])
        np.testing.assert_array_equal(ref_left[13:17], recon[28:32, 15][::-1][::-1])


class TestFiltering:
    def test_121_filter_values(self):
        n = 8
        ref_top = np.arange(2 * n + 1, dtype=np.int32) * 10
        ref_left = np.arange(2 * n + 1, dtype=np.int32) * 7
        ref_left[0] = ref_top[0]
        f_top, f_left = rs.filter_reference_samples(ref_top, ref_left, n,
                                                    strong_intra_smoothing=False)
        # Endpoints unfiltered.
        assert f_top[2 * n] == ref_top[2 * n]
        assert f_left[2 * n] == ref_left[2 * n]
        # Corner: (left[0] + 2*corner + top[0] + 2) >> 2.
        expected_corner = (ref_left[1] + 2 * ref_top[0] + ref_top[1] + 2) >> 2
        assert f_top[0] == expected_corner == f_left[0]
        # Interior sample.
        assert f_top[2] == (ref_top[1] + 2 * ref_top[2] + ref_top[3] + 2) >> 2

    def test_strong_smoothing_on_flat_32(self):
        n = 32
        # Perfectly linear borders trigger bilinear smoothing.
        corner = 100
        ref_top = np.linspace(corner, 160, 2 * n + 1).round().astype(np.int32)
        ref_left = np.linspace(corner, 40, 2 * n + 1).round().astype(np.int32)
        f_top, f_left = rs.filter_reference_samples(ref_top, ref_left, n)
        i = np.arange(1, 2 * n)
        expect_top = ((2 * n - i) * corner + i * int(ref_top[2 * n]) + n) >> 6
        np.testing.assert_array_equal(f_top[1:2 * n], expect_top)
        assert f_top[0] == corner

    def test_strong_smoothing_rejected_on_nonflat(self):
        n = 32
        rng = np.random.default_rng(1)
        ref_top = rng.integers(0, 256, 2 * n + 1).astype(np.int32)
        ref_left = rng.integers(0, 256, 2 * n + 1).astype(np.int32)
        ref_left[0] = ref_top[0]
        f_top, _ = rs.filter_reference_samples(ref_top, ref_left, n)
        expected_interior = (ref_top[1] + 2 * ref_top[2] + ref_top[3] + 2) >> 2
        assert f_top[2] == expected_interior

    def test_mode_filter_decision(self):
        # 8x8: threshold 7 -> planar (diff 10) filtered, mode 25 (diff 1) not.
        assert rs.use_filtered_for_mode(0, 8)
        assert not rs.use_filtered_for_mode(25, 8)
        assert not rs.use_filtered_for_mode(1, 8)   # DC never
        # 4x4: threshold 10 -> nothing filtered (max diff is 10).
        for m in range(35):
            assert not rs.use_filtered_for_mode(m, 4)
        # 16x16: threshold 1.
        assert rs.use_filtered_for_mode(24, 16)
        assert not rs.use_filtered_for_mode(25, 16)
        # 32x32: everything except DC/H/V.
        assert rs.use_filtered_for_mode(11, 32)
        assert not rs.use_filtered_for_mode(10, 32)
