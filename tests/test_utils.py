"""Tests for utils: color conversion, metrics, YUV IO, parsing, extraction, masking.

Mirrors the coverage of the reference's `test_tools.py`, `test_parsing.py` and
the extraction tests of `test_sets.py` (SURVEY.md section 4) as pytest asserts.
"""

import argparse

import numpy as np
import pytest

from context_adaptive_neural_network_based_prediction_tpu.utils import (
    color, metrics, yuv, parsing)
from context_adaptive_neural_network_based_prediction_tpu.data import extraction, masking


class TestColor:
    def test_roundtrip_close(self):
        rng = np.random.default_rng(0)
        rgb = rng.integers(0, 256, size=(32, 48, 3), dtype=np.uint8)
        ycbcr = color.rgb_to_ycbcr(rgb)
        back = color.ycbcr_to_rgb(ycbcr)
        assert np.max(np.abs(back.astype(int) - rgb.astype(int))) <= 3

    def test_gray_maps_to_neutral_chroma(self):
        gray = np.full((4, 4, 3), 77, dtype=np.uint8)
        ycbcr = color.rgb_to_ycbcr(gray)
        assert np.all(ycbcr[:, :, 0] == 77)
        assert np.all(ycbcr[:, :, 1] == 128)
        assert np.all(ycbcr[:, :, 2] == 128)

    def test_known_values(self):
        # Pure red per ITU-T T.871: Y=76, Cb=85, Cr=255.
        red = np.zeros((1, 1, 3), dtype=np.uint8)
        red[0, 0, 0] = 255
        ycbcr = color.rgb_to_ycbcr(red)
        assert ycbcr[0, 0, 0] == 76
        assert ycbcr[0, 0, 1] == 85
        assert ycbcr[0, 0, 2] == 255

    def test_rejects_bad_input(self):
        with pytest.raises(TypeError):
            color.rgb_to_ycbcr(np.zeros((2, 2, 3), dtype=np.float32))
        with pytest.raises(ValueError):
            color.rgb_to_ycbcr(np.zeros((2, 2, 4), dtype=np.uint8))


class TestMetrics:
    def test_psnr_identical(self):
        a = np.full((8, 8), 10, dtype=np.uint8)
        # MSE=0 -> 10*log10(255^2/1e-6)
        assert metrics.compute_psnr(a, a) == pytest.approx(10 * np.log10(255.0 ** 2 / 1e-6))

    def test_psnr_known(self):
        a = np.zeros((4, 4), dtype=np.uint8)
        b = np.full((4, 4), 16, dtype=np.uint8)
        expected = 10 * np.log10(255.0 ** 2 / (256.0 + 1e-6))
        assert metrics.compute_psnr(a, b) == pytest.approx(expected)

    def test_psnr_batch_matches_scalar(self):
        rng = np.random.default_rng(1)
        a = rng.integers(0, 256, (3, 8, 8, 1), dtype=np.uint8)
        b = rng.integers(0, 256, (3, 8, 8, 1), dtype=np.uint8)
        batch = metrics.compute_psnr_batch(a, b)
        for i in range(3):
            assert batch[i] == pytest.approx(metrics.compute_psnr(a[i], b[i]))

    def test_bjontegaard_identical_curves_zero(self):
        rates = np.array([0.1, 0.2, 0.4, 0.8])
        psnrs = np.array([30.0, 33.0, 36.0, 39.0])
        assert metrics.compute_bjontegaard(rates, psnrs, rates, psnrs) == pytest.approx(0.0)

    def test_bjontegaard_uniform_saving(self):
        # Curve 1 spends exactly 10% less rate at every quality point.
        rates0 = np.array([0.1, 0.2, 0.4, 0.8])
        psnrs = np.array([30.0, 33.0, 36.0, 39.0])
        rates1 = rates0 * 0.9
        bd = metrics.compute_bjontegaard(rates0, psnrs, rates1, psnrs)
        assert bd == pytest.approx(-10.0, abs=1e-6)

    def test_bjontegaard_rejects_nonpositive(self):
        rates = np.array([0.1, 0.2, 0.4, 0.0])
        psnrs = np.array([30.0, 33.0, 36.0, 39.0])
        with pytest.raises(ValueError):
            metrics.compute_bjontegaard(rates, psnrs, rates, psnrs)


class TestYuv:
    def test_roundtrip_400(self, tmp_path):
        rng = np.random.default_rng(2)
        video = rng.integers(0, 256, (16, 24, 1, 2), dtype=np.uint8)
        path = str(tmp_path / "a.yuv")
        yuv.write_400_or_420(video, path)
        back = yuv.read_400_or_420(16, 24, 2, np.uint8, True, path)
        np.testing.assert_array_equal(video, back)

    def test_roundtrip_420_chroma_repeat(self, tmp_path):
        rng = np.random.default_rng(3)
        video = rng.integers(0, 256, (8, 8, 3, 1), dtype=np.uint8)
        path = str(tmp_path / "b.yuv")
        yuv.write_400_or_420(video, path)
        back = yuv.read_400_or_420(8, 8, 1, np.uint8, False, path)
        np.testing.assert_array_equal(back[:, :, 0], video[:, :, 0])
        # Chroma was 2x2 subsampled then repeated: top-left of each 2x2 survives.
        np.testing.assert_array_equal(back[::2, ::2, 1], video[::2, ::2, 1])
        np.testing.assert_array_equal(back[0::2, 0::2, 2], back[1::2, 1::2, 2])

    def test_write_refuses_overwrite(self, tmp_path):
        video = np.zeros((2, 2, 1, 1), dtype=np.uint8)
        path = str(tmp_path / "c.yuv")
        yuv.write_400_or_420(video, path)
        with pytest.raises(IOError):
            yuv.write_400_or_420(video, path)

    def test_uint16(self, tmp_path):
        video = (np.arange(2 * 4 * 1 * 1, dtype=np.uint16) * 300).reshape(2, 4, 1, 1)
        path = str(tmp_path / "d.yuv")
        yuv.write_400_or_420(video, path)
        back = yuv.read_400_or_420(2, 4, 1, np.uint16, True, path)
        np.testing.assert_array_equal(video, back)


class TestParsing:
    def test_validators(self):
        assert parsing.int_strictly_positive("3") == 3
        assert parsing.float_positive("0.0") == 0.0
        assert parsing.tuple_two_positive_integers("4,8") == (4, 8)
        with pytest.raises(argparse.ArgumentTypeError):
            parsing.int_strictly_positive("0")
        with pytest.raises(argparse.ArgumentTypeError):
            parsing.float_positive("-1.0")
        with pytest.raises(argparse.ArgumentTypeError):
            parsing.tuple_two_positive_integers("4")
        with pytest.raises(argparse.ArgumentTypeError):
            parsing.tuple_two_positive_integers("4,-2")


class TestExtraction:
    def test_geometry_single(self):
        # Channel values encode their (row, col) so the geometry is self-checking.
        h, w_ch, w = 32, 40, 4
        channel = (np.arange(h)[:, None] * 100 + np.arange(w_ch)[None, :]) % 256
        channel = channel.astype(np.uint8)[..., None]
        above, left, target = extraction.extract_context_portions_target_from_channel(
            channel, w, 2, 3)
        assert above.shape == (w, 3 * w, 1)
        assert left.shape == (2 * w, w, 1)
        assert target.shape == (w, w, 1)
        np.testing.assert_array_equal(above[:, :, 0], channel[2:2 + w, 3:3 + 3 * w, 0])
        np.testing.assert_array_equal(left[:, :, 0], channel[2 + w:2 + 3 * w, 3:3 + w, 0])
        np.testing.assert_array_equal(
            target[:, :, 0], channel[2 + w:2 + 2 * w, 3 + w:3 + 2 * w, 0])

    def test_pair_contexts_from_artifact_plane(self):
        rng = np.random.default_rng(4)
        pair = rng.integers(0, 256, (24, 24, 2), dtype=np.uint8)
        above, left, target = extraction.extract_context_portions_target_from_channel(
            pair, 4, 0, 0)
        np.testing.assert_array_equal(above[:, :, 0], pair[0:4, 0:12, 1])
        np.testing.assert_array_equal(left[:, :, 0], pair[4:12, 0:4, 1])
        # Target always comes from the clean plane.
        np.testing.assert_array_equal(target[:, :, 0], pair[4:8, 4:8, 0])

    def test_batched_matches_single(self):
        rng = np.random.default_rng(5)
        channel = rng.integers(0, 256, (64, 64, 1), dtype=np.uint8)
        rows = np.array([0, 5, 20])
        cols = np.array([1, 7, 30])
        a_b, l_b, t_b = extraction.extract_context_portions_targets_from_channel(
            channel, 8, rows, cols)
        for i in range(3):
            a, l, t = extraction.extract_context_portions_target_from_channel(
                channel, 8, int(rows[i]), int(cols[i]))
            np.testing.assert_array_equal(a_b[i], a)
            np.testing.assert_array_equal(l_b[i], l)
            np.testing.assert_array_equal(t_b[i], t)

    def test_out_of_bounds_raises(self):
        channel = np.zeros((16, 16, 1), dtype=np.uint8)
        with pytest.raises(ValueError):
            extraction.extract_context_portions_target_from_channel(channel, 8, 0, 0)


class TestMasking:
    def test_mask_zeroes_correct_regions(self):
        w = 8
        above = np.ones((2, w, 3 * w, 1), dtype=np.uint8) * 7
        left = np.ones((2, 2 * w, w, 1), dtype=np.uint8) * 9
        target = np.ones((2, w, w, 1), dtype=np.uint8) * 5
        a, l, t = masking.preprocess_context_portions_targets(
            above, left, target, 2.0, (4, 8), False)
        assert a.dtype == np.float32
        # Unmasked area is value - mean; masked area exactly 0.
        np.testing.assert_allclose(a[:, :, :3 * w - 4, :], 5.0)
        np.testing.assert_allclose(a[:, :, 3 * w - 4:, :], 0.0)
        np.testing.assert_allclose(l[:, :2 * w - 8, :, :], 7.0)
        np.testing.assert_allclose(l[:, 2 * w - 8:, :, :], 0.0)
        np.testing.assert_allclose(t, 3.0)

    def test_flatten_order_above_then_left(self):
        w = 4
        above = np.arange(2 * w * 3 * w).reshape(2, w, 3 * w, 1).astype(np.uint8)
        left = (np.arange(2 * 2 * w * w).reshape(2, 2 * w, w, 1) + 100).astype(np.uint8)
        target = np.zeros((2, w, w, 1), dtype=np.uint8)
        flat, _ = masking.preprocess_context_portions_targets(
            above, left, target, 0.0, (0, 0), True)
        assert flat.shape == (2, 5 * w * w)
        np.testing.assert_allclose(flat[0, :3 * w * w], above[0].reshape(-1))
        np.testing.assert_allclose(flat[0, 3 * w * w:], left[0].reshape(-1))

    def test_invalid_mask_raises(self):
        w = 8
        above = np.zeros((1, w, 3 * w, 1), dtype=np.uint8)
        left = np.zeros((1, 2 * w, w, 1), dtype=np.uint8)
        target = np.zeros((1, w, w, 1), dtype=np.uint8)
        with pytest.raises(ValueError):
            masking.preprocess_context_portions_targets(
                above, left, target, 0.0, (3, 0), True)
        with pytest.raises(ValueError):
            masking.preprocess_context_portions_targets(
                above, left, target, 0.0, (0, 12), True)

    def test_per_example_masks(self):
        w = 4
        above = np.ones((2, w, 3 * w, 1), dtype=np.float32)
        left = np.ones((2, 2 * w, w, 1), dtype=np.float32)
        a, l = masking.mask_portions(above, left, np.array([0, 4]), np.array([4, 0]))
        np.testing.assert_allclose(a[0], 1.0)
        np.testing.assert_allclose(a[1, :, -4:, :], 0.0)
        np.testing.assert_allclose(l[0, -4:, :, :], 0.0)
        np.testing.assert_allclose(l[1], 1.0)
