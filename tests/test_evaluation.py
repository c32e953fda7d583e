"""Tests for datasets, pipeline, IPFCN, and the evaluation layer."""

import os

import numpy as np
import pytest
import jax

from context_adaptive_neural_network_based_prediction_tpu.data import (
    datasets, pipeline)
from context_adaptive_neural_network_based_prediction_tpu.evaluation import (
    maps, performance, prediction_comparison, stats)
from context_adaptive_neural_network_based_prediction_tpu.models import ipfcn
from context_adaptive_neural_network_based_prediction_tpu.codec import encoder

PSEUDO_IMAGES = [
    "/root/reference/sets/pseudo_data/rgb_library.jpg",
    "/root/reference/sets/pseudo_data/rgb_cliff.jpg",
    "/root/reference/sets/pseudo_data/rgb_web.jpg",
]


def natural(h, w, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    f = 120 + 50 * np.sin(xx / 7.0) + 35 * np.cos(yy / 11.0) + rng.normal(0, 5, (h, w))
    return np.clip(f, 0, 255).astype(np.uint8)


def _have_pseudo():
    return all(os.path.exists(p) for p in PSEUDO_IMAGES)


@pytest.mark.skipif(not _have_pseudo(), reason="reference pseudo images absent")
class TestDatasets:
    def test_build_test_set_rotates_portrait(self):
        arr, rotated = datasets.build_test_set(PSEUDO_IMAGES[:2], 256, 256)
        assert arr.shape == (2, 256, 256, 3)
        assert arr.dtype == np.uint8

    def test_mean_computation(self):
        mean = datasets.compute_luminance_mean(PSEUDO_IMAGES)
        assert 40 < mean < 220

    def test_training_shards_triplets(self, tmp_path):
        n = datasets.create_training_shards(
            PSEUDO_IMAGES, str(tmp_path), width_target=8, nb_shards=2,
            triplets_per_image=4)
        assert n == 3 * 4
        files = []
        for root, _, names in os.walk(tmp_path):
            files += [os.path.join(root, f) for f in names]
        assert files
        with np.load(files[0]) as d:
            assert d["above"].shape[1:] == (8, 24, 1)
            assert d["left"].shape[1:] == (16, 8, 1)
            assert d["target"].shape[1:] == (8, 8, 1)

    def test_pipeline_batches(self, tmp_path):
        datasets.create_training_shards(
            PSEUDO_IMAGES, str(tmp_path), width_target=4, nb_shards=2,
            triplets_per_image=8)
        p = pipeline.TrainingPipeline(str(tmp_path), 6, 4, shuffle_buffer=10)
        above, left, target = next(p.batches())
        assert above.shape == (6, 4, 12, 1)
        assert left.shape == (6, 8, 4, 1)
        assert target.shape == (6, 4, 4, 1)

    def test_pipeline_on_the_fly_extraction(self, tmp_path):
        datasets.create_training_shards(
            PSEUDO_IMAGES, str(tmp_path), width_target=None, nb_shards=1)
        p = pipeline.TrainingPipeline(str(tmp_path), 3, 16,
                                      is_extraction_on_the_fly=True,
                                      shuffle_buffer=5)
        above, left, target = next(p.batches())
        assert above.shape == (3, 16, 48, 1)
        assert target.shape == (3, 16, 16, 1)


class TestIpfcn:
    def test_extraction_geometry(self):
        rng = np.random.default_rng(0)
        ch = rng.integers(0, 256, (64, 64, 1), dtype=np.uint8)
        a, l = ipfcn.extract_pair_groups_lines_from_channel(ch, 8, 4, 6)
        assert a.shape == (8, 24, 1)
        assert l.shape == (16, 8, 1)
        np.testing.assert_array_equal(a[:, :, 0], ch[4:12, 6:30, 0])
        np.testing.assert_array_equal(l[:, :, 0], ch[12:28, 6:14, 0])

    def test_forward_and_mean_restore(self):
        params = ipfcn.init_params(jax.random.PRNGKey(0), 8)
        rng = np.random.default_rng(1)
        ga = rng.integers(0, 256, (5, 8, 24, 1), dtype=np.uint8)
        gl = rng.integers(0, 256, (5, 16, 8, 1), dtype=np.uint8)
        out = ipfcn.predict_uint8(params, ga, gl, 8)
        assert out.shape == (5, 8, 8)
        assert out.dtype == np.uint8

    def test_preprocess_zero_mean(self):
        rng = np.random.default_rng(2)
        ga = rng.integers(0, 256, (3, 8, 24, 1), dtype=np.uint8)
        gl = rng.integers(0, 256, (3, 16, 8, 1), dtype=np.uint8)
        flat, means = ipfcn.preprocess_pair_groups(ga, gl)
        assert flat.shape == (3, 32 * 8 + 64)
        np.testing.assert_allclose(flat.mean(axis=1), 0.0, atol=1e-3)


class TestPerformance:
    def test_rd_point_and_cache(self, tmp_path):
        frame = natural(32, 32, seed=3)
        cache = str(tmp_path / "rd.pkl")
        pts = performance.compute_or_load_rates_psnrs(
            frame, (27, 37), path_to_cache=cache, ctu_size=32)
        assert len(pts) == 2
        assert pts[0].rate_bpp > pts[1].rate_bpp
        # Cached reload returns identical values.
        pts2 = performance.compute_or_load_rates_psnrs(
            frame, (27, 37), path_to_cache=cache)
        assert pts2[0].rate_bpp == pts[0].rate_bpp

    def test_bd_rate_structure(self):
        mk = lambda rates, psnrs: [
            performance.RdPoint(0, r, p, 0, 0) for r, p in zip(rates, psnrs)]
        anchor = mk([0.1, 0.2, 0.4, 0.8], [30, 33, 36, 39])
        test = mk([0.09, 0.18, 0.36, 0.72], [30, 33, 36, 39])
        bd = performance.bd_rate_low_high_full(anchor, test)
        assert bd["full"] == pytest.approx(-10.0, abs=0.01)

    def test_plot_writes_png(self, tmp_path):
        pts = [performance.RdPoint(q, 0.1 * (i + 1), 30 + i, 0, 0)
               for i, q in enumerate((37, 32, 27))]
        png = str(tmp_path / "rd.png")
        performance.plot_rate_distortion_curves({"ours": pts}, png)
        assert os.path.getsize(png) > 0


class TestStats:
    def test_mode_counts_from_tree(self):
        frame = natural(64, 64, seed=4)
        res = encoder.encode_frame(frame, 32)
        counts = stats.collect_mode_counts(res)
        assert counts.sum() > 0
        ratios = stats.counts_to_ratios(counts)
        sums = ratios.sum(axis=1)
        for i, s in enumerate(sums):
            if counts[i].sum() > 0:
                assert s == pytest.approx(1.0)

    def test_plot(self, tmp_path):
        frame = natural(64, 64, seed=5)
        res = encoder.encode_frame(frame, 37)
        counts = stats.collect_mode_counts(res)
        png = str(tmp_path / "stats.png")
        stats.plot_mode_frequencies(counts, png)
        assert os.path.getsize(png) > 0

    def test_parse_hm_beacon_file(self, tmp_path):
        """Parses the HM beacon format (TEncGOP stats writer /
        reference hevc/stats.py:57-226 consumer semantics)."""
        p = tmp_path / "stats.txt"
        p.write_text(
            "some preamble line\n"
            "The index 2 wins the fast selection: 1 2 3 4 5\n"
            "The index 2 wins the rate-distortion selection: 10 0 0 0 1\n"
            "The index 34 is found in the fast list: 0 0 7 0 0\n"
            "The pipeline {fast selection, rate-distortion selection}"
            " is run: 100 50 25 12 6\n")
        counts, runs = stats.parse_hm_stats_file(str(p))
        assert counts[0, 2].tolist() == [1, 2, 3, 4, 5]
        assert counts[1, 2].tolist() == [10, 0, 0, 0, 1]
        assert counts[2, 34].tolist() == [0, 0, 7, 0, 0]
        assert runs.tolist() == [100, 50, 25, 12, 6]

    @pytest.mark.skipif(
        __import__("context_adaptive_neural_network_based_prediction_tpu."
                   "evaluation.hm_driver", fromlist=["hm_binary"]
                   ).hm_binary("TAppEncoderStatic") is None,
        reason="HM TAppEncoderStatic not available")
    def test_hm_beacon_stats_end_to_end(self, tmp_path):
        """Real instrumented HM encode -> beacon parse -> comparison plot
        with our codec's mode histogram on one axis (VERDICT item 9)."""
        frame = natural(64, 64, seed=7)
        hm_counts = stats.hm_rd_win_counts([frame], 32)
        assert hm_counts.sum() > 0
        res = encoder.encode_frame(frame, 32)
        ours = stats.collect_mode_counts(res)
        png = str(tmp_path / "vs_hm.png")
        stats.plot_mode_frequencies_vs_hm(ours, hm_counts, png)
        assert os.path.getsize(png) > 0


class TestMaps:
    def test_ppm_roundtrip(self, tmp_path):
        rng = np.random.default_rng(6)
        rgb = rng.integers(0, 256, (8, 12, 3), dtype=np.uint8)
        p = str(tmp_path / "x.ppm")
        maps.write_ppm(p, rgb)
        back = maps.read_ppm(p)
        np.testing.assert_array_equal(rgb, back)

    def test_mode_map_colors(self, tmp_path):
        m = np.array([[0, 18], [35, 20]], dtype=np.int32)
        rgb = maps.mode_map_to_rgb(m)
        assert rgb.shape == (8, 8, 3)
        assert tuple(rgb[0, 0]) == maps.COLOR_PLANAR_DC
        assert tuple(rgb[0, 4]) == maps.COLOR_MODE_18
        assert tuple(rgb[4, 0]) == maps.COLOR_PNNS
        assert tuple(rgb[4, 4]) == maps.COLOR_ANGULAR


class TestPredictionComparison:
    def test_compare_with_toy_pnn(self, tmp_path):
        from context_adaptive_neural_network_based_prediction_tpu.models import pnn

        w = 8
        params = pnn.init_params(jax.random.PRNGKey(1), w, True)
        channels = np.stack([natural(64, 64, seed=i)[:, :, None] for i in range(2)])
        rows = prediction_comparison.compare_on_channels(
            channels, w, params, True, 117.895, nb_positions_per_image=5,
            val_masks=((0, 0), ("w", "w")))
        assert len(rows) == 2
        # The HEVC oracle on natural content beats an untrained PNN.
        assert rows[0].mean_psnr_hevc_best > rows[0].mean_psnr_pnn
        assert 0.0 <= rows[0].pnn_win_frequency <= 1.0
        csv_path = str(tmp_path / "table.csv")
        prediction_comparison.write_csv(rows, csv_path)
        assert os.path.getsize(csv_path) > 0
