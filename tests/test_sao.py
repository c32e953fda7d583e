"""Tests for Sample Adaptive Offset."""

import numpy as np
import pytest

from context_adaptive_neural_network_based_prediction_tpu.codec import (
    cabac, contexts, decoder, encoder, sao)


def natural(h, w, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    f = 120 + 50 * np.sin(xx / 7.0) + 35 * np.cos(yy / 11.0) + rng.normal(0, 5, (h, w))
    return np.clip(f, 0, 255).astype(np.uint8)


class TestEoCategories:
    def test_monotone_ramp_has_no_extrema(self):
        rec = np.tile(np.arange(16, dtype=np.uint8) * 10, (8, 1))
        cat = sao._eo_categories(rec, 0)  # horizontal
        # Interior of a strictly increasing row: neither min nor max -> cat 0.
        assert np.all(cat[:, 1:-1] == 0)

    def test_local_extrema_classified(self):
        rec = np.full((4, 8), 100, np.uint8)
        rec[2, 3] = 50   # local minimum
        rec[1, 5] = 200  # local maximum
        cat = sao._eo_categories(rec, 0)
        assert cat[2, 3] == 1
        assert cat[1, 5] == 4

    def test_boundary_pixels_category_zero(self):
        rng = np.random.default_rng(1)
        rec = rng.integers(0, 256, (8, 8)).astype(np.uint8)
        for c in range(4):
            cat = sao._eo_categories(rec, c)
            # At least the full outer ring positions touched by the class's
            # neighbours must be 0 where neighbours fall outside.
            if c == 0:
                assert np.all(cat[:, 0] == 0) and np.all(cat[:, -1] == 0)
            if c == 1:
                assert np.all(cat[0, :] == 0) and np.all(cat[-1, :] == 0)


class TestApply:
    def test_bo_offsets_applied_to_bands(self):
        deb = np.full((8, 8), 65, np.uint8)   # band 65>>3 = 8
        grid = [[sao.SaoParams(sao.MODE_BO, 8, (3, 0, 0, 0))]]
        out = sao.apply_sao(deb, grid, 8)
        assert np.all(out == 68)

    def test_eo_offsets_applied(self):
        deb = np.full((8, 8), 100, np.uint8)
        deb[4, 4] = 90  # local min everywhere
        grid = [[sao.SaoParams(sao.MODE_EO, 0, (5, 0, 0, 0))]]
        out = sao.apply_sao(deb, grid, 8)
        assert out[4, 4] == 95
        assert out[4, 3] == 100  # neighbours (cat 4 -> offset 0 here)

    def test_off_is_identity(self):
        rng = np.random.default_rng(2)
        deb = rng.integers(0, 256, (16, 16)).astype(np.uint8)
        grid = [[sao.SaoParams(), sao.SaoParams()],
                [sao.SaoParams(), sao.SaoParams()]]
        np.testing.assert_array_equal(sao.apply_sao(deb, grid, 8), deb)


class TestSyntaxRoundtrip:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_params_roundtrip(self, seed):
        rng = np.random.default_rng(seed)
        grid = []
        for cy in range(3):
            row = []
            for cx in range(4):
                mode = int(rng.integers(0, 3))
                if mode == sao.MODE_OFF:
                    row.append(sao.SaoParams())
                elif mode == sao.MODE_BO:
                    offs = tuple(int(rng.integers(-7, 8)) for _ in range(4))
                    row.append(sao.SaoParams(mode, int(rng.integers(0, 29)), offs))
                else:
                    offs = (int(rng.integers(0, 8)), int(rng.integers(0, 8)),
                            -int(rng.integers(0, 8)), -int(rng.integers(0, 8)))
                    row.append(sao.SaoParams(mode, int(rng.integers(0, 4)), offs))
            grid.append(row)
        enc_ctx = contexts.make_context_states(32)
        dec_ctx = contexts.make_context_states(32)
        enc = cabac.CabacEncoder()
        sao.encode_params(enc, enc_ctx, grid)
        data = enc.terminate_and_finish()
        dec = cabac.CabacDecoder(data)
        out = sao.decode_params(dec, dec_ctx, 3, 4)
        for cy in range(3):
            for cx in range(4):
                assert out[cy][cx].key() == grid[cy][cx].key()

    def test_merge_flags_compress_uniform_grid(self):
        grid = [[sao.SaoParams(sao.MODE_EO, 2, (1, 1, -1, -1))] * 6 for _ in range(4)]
        enc_ctx = contexts.make_context_states(32)
        enc = cabac.CabacEncoder()
        sao.encode_params(enc, enc_ctx, grid)
        data = enc.terminate_and_finish()
        assert len(data) < 12  # merges collapse everything


class TestEndToEnd:
    def test_sao_improves_psnr_on_natural_content(self):
        import PIL.Image
        import os
        from context_adaptive_neural_network_based_prediction_tpu.utils import (
            color, metrics)

        path = "/root/reference/sets/pseudo_data/rgb_library.jpg"
        if not os.path.exists(path):
            pytest.skip("reference image unavailable")
        luma = color.rgb_to_ycbcr(
            np.asarray(PIL.Image.open(path)))[:128, :128, 0]
        r0 = encoder.encode_frame(luma, 37, sao=False)
        r1 = encoder.encode_frame(luma, 37, sao=True)
        p0 = metrics.compute_psnr(luma, r0.reconstruction)
        p1 = metrics.compute_psnr(luma, r1.reconstruction)
        assert p1 >= p0  # RD-gated: never worse PSNR unless rate-justified

    def test_decoder_bit_exact_with_sao(self):
        frame = natural(64, 48, seed=3)
        res = encoder.encode_frame(frame, 37, sao=True)
        dec = decoder.decode_frame(res.bitstream)
        np.testing.assert_array_equal(res.reconstruction, dec.reconstruction)
