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


# ---------------------------------------------------- channelwise merger ----

from context_adaptive_neural_network_based_prediction_tpu.ops.pallas import (  # noqa: E402
    merger as pallas_merger)


class TestMergerKernel:
    def _data(self, w, batch, seed=0):
        """Branch-feature shapes for the conv PNN at target width w."""
        strides = pnn.STRIDES_BRANCH[w]
        prod = int(np.prod(strides))
        m = 32 * prod
        rng = np.random.default_rng(seed)
        x0 = rng.normal(0, 1, (batch, w // prod, 3 * w // prod, m)).astype(
            np.float32)
        x1 = rng.normal(0, 1, (batch, 2 * w // prod, w // prod, m)).astype(
            np.float32)
        p = x0[0, :, :, 0].size + x1[0, :, :, 0].size
        o = (w // prod) ** 2
        wgt = rng.normal(0, 0.1, (m, p, o)).astype(np.float32)
        b = rng.normal(0, 0.1, (m, o)).astype(np.float32)
        return wgt, b, x0, x1, w // prod

    @pytest.mark.parametrize("w", [16, 32])
    @pytest.mark.parametrize("batch", [1, 5, 130])
    def test_matches_xla_merger(self, w, batch):
        wgt, b, x0, x1, side = self._data(w, batch, seed=w + batch)
        ref = np.asarray(pnn.leaky_relu(pnn.channelwise_fc_merger(
            wgt, b, x0, x1, side, side)))
        out = np.asarray(pallas_merger.merger_forward(
            wgt, b, x0, x1, side, side))
        assert out.shape == ref.shape
        scale = np.abs(ref).max() + 1e-6
        assert np.abs(out - ref).max() / scale < 2e-2

    def test_no_activation_variant(self):
        wgt, b, x0, x1, side = self._data(16, 4, seed=3)
        ref = np.asarray(pnn.channelwise_fc_merger(wgt, b, x0, x1, side, side))
        out = np.asarray(pallas_merger.merger_forward(
            wgt, b, x0, x1, side, side, apply_act=False))
        scale = np.abs(ref).max() + 1e-6
        assert np.abs(out - ref).max() / scale < 2e-2

    def test_batch_padding_does_not_leak(self):
        wgt, b, x0, x1, side = self._data(16, 6, seed=9)
        full = np.asarray(pallas_merger.merger_forward(
            wgt, b, x0, x1, side, side))
        part = np.asarray(pallas_merger.merger_forward(
            wgt, b, x0[:2], x1[:2], side, side))
        np.testing.assert_allclose(part, full[:2], rtol=1e-5, atol=1e-4)


def test_int_merger_kernel_bit_identical_to_xla_dot():
    """The integer Pallas merger (codec-shape vector kernel) is BIT-identical
    to the XLA integer dot - integer sums are associative, so it is a legal
    swap inside the normative quantized forward."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from context_adaptive_neural_network_based_prediction_tpu.ops.pallas import (
        merger_int)

    rng = np.random.default_rng(1)
    for (n, p, o, m) in ((31, 80, 16, 64), (17, 80, 16, 128)):
        x = rng.integers(-2047, 2048, (n, p, m)).astype(np.int16)
        w = rng.integers(-511, 512, (m, p, o)).astype(np.int16)
        b = rng.integers(-10 ** 5, 10 ** 5, (m, o)).astype(np.int32)
        got = np.asarray(merger_int.merger_int_forward(
            jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), interpret=True))
        ref = np.asarray(jax.lax.dot_general(
            jnp.asarray(x).transpose(2, 0, 1), jnp.asarray(w),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)) + b[:, None, :]
        assert np.array_equal(got, ref)


def test_quantized_forward_same_with_and_without_pallas_merger():
    """forward_q output does not depend on the merger implementation."""
    import os

    import jax
    import numpy as np

    from context_adaptive_neural_network_based_prediction_tpu.models import (
        pnn, pnn_q)

    width = 16
    params = pnn.init_params(jax.random.PRNGKey(0), width, False)
    calib = pnn_q.calibration_contexts(width, False, n_samples=32)
    q = pnn_q.quantize_pnn(params, calib, width, False)
    ev = pnn_q.calibration_contexts(width, False, n_samples=8, seed=9)
    base = np.asarray(pnn_q.forward_q(q, ev, width, False))
    # Force the pallas path in interpret mode via monkeypatching the gate.
    orig = pnn_q._use_pallas_merger
    try:
        pnn_q._use_pallas_merger = lambda: True
        from context_adaptive_neural_network_based_prediction_tpu.ops.pallas \
            import merger_int as mi
        orig_fwd = mi.merger_int_forward
        mi.merger_int_forward = lambda *a, **k: orig_fwd(
            *a, **dict(k, interpret=True))
        with_pallas = np.asarray(pnn_q.forward_q(q, ev, width, False))
        mi.merger_int_forward = orig_fwd
    finally:
        pnn_q._use_pallas_merger = orig
    assert np.array_equal(base, with_pallas)
