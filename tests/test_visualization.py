"""Tests for PNN visualization helpers (SURVEY P15 parity)."""

import os

import numpy as np
import jax

from context_adaptive_neural_network_based_prediction_tpu.models import (
    pnn, visualization as viz)


class TestArrangement:
    def test_context_arrangement_geometry(self):
        w = 8
        above = np.full((w, 3 * w), 10.0) - 5.0
        left = np.full((2 * w, w), 20.0) - 5.0
        target = np.full((w, w), 30.0) - 5.0
        img = viz.arrange_context_portions(above, left, target, mean_training=5.0)
        assert img.shape == (3 * w, 3 * w)
        assert np.all(img[0:w, :] == 10)
        assert np.all(img[w:, 0:w] == 20)
        assert np.all(img[w:2 * w, w:2 * w] == 30)
        assert np.all(img[2 * w:, w:] == 255)  # unused quadrant white

    def test_save(self, tmp_path):
        w = 4
        p = str(tmp_path / "ctx.png")
        viz.save_context_arrangement(
            p, np.zeros((w, 3 * w)), np.zeros((2 * w, w)), mean_training=100.0)
        assert os.path.getsize(p) > 0


class TestFilters:
    def test_fc_filters_shape(self):
        params = pnn.init_params(jax.random.PRNGKey(0), 8, True)
        filters = viz.fc_first_layer_filters(params, 8)
        assert filters.shape == (1200, 24, 24)
        # Above region finite, unused quadrant NaN.
        assert np.isfinite(filters[0, 0, :]).all()
        assert np.isnan(filters[0, 20, 20])

    def test_conv_filters_shape(self):
        params = pnn.init_params(jax.random.PRNGKey(1), 16, False)
        filters = viz.conv_first_layer_filters(params)
        assert filters.shape == (64, 5, 5)

    def test_plot_grid(self, tmp_path):
        params = pnn.init_params(jax.random.PRNGKey(2), 16, False)
        filters = viz.conv_first_layer_filters(params)
        p = str(tmp_path / "filters.png")
        viz.plot_filter_grid(filters, p, max_filters=16)
        assert os.path.getsize(p) > 0
