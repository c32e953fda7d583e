"""Tests for the Pallas fused FC-PNN forward (interpreter mode on CPU)."""

import numpy as np
import pytest
import jax

from context_adaptive_neural_network_based_prediction_tpu.models import pnn
from context_adaptive_neural_network_based_prediction_tpu.ops.pallas import (
    fc_forward)


@pytest.mark.parametrize("w", [4, 8])
@pytest.mark.parametrize("batch", [1, 7, 128, 200])
def test_matches_xla_reference(w, batch):
    params = pnn.init_params(jax.random.PRNGKey(w), w, True)
    rng = np.random.default_rng(batch)
    x = rng.normal(0, 30, (batch, 5 * w * w)).astype(np.float32)
    ref = np.asarray(pnn.fc_forward(params["fully_connected"], x, w))
    out = np.asarray(fc_forward.fc_forward_pallas(params, x, w))
    assert out.shape == ref.shape
    scale = np.abs(ref).max() + 1e-6
    # bf16 weight storage: expect ~1e-2 relative agreement.
    assert np.abs(out - ref).max() / scale < 2e-2


def test_batch_padding_does_not_leak():
    # Rows beyond the real batch must not influence results: compare a batch
    # of 3 against the same rows inside a batch of 5.
    w = 8
    params = pnn.init_params(jax.random.PRNGKey(1), w, True)
    rng = np.random.default_rng(0)
    x5 = rng.normal(0, 30, (5, 320)).astype(np.float32)
    out5 = np.asarray(fc_forward.fc_forward_pallas(params, x5, w))
    out3 = np.asarray(fc_forward.fc_forward_pallas(params, x5[:3], w))
    np.testing.assert_allclose(out3, out5[:3], rtol=1e-5, atol=1e-4)
