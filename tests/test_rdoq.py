"""Tests for rate-distortion optimized quantization."""

import numpy as np
import pytest

from context_adaptive_neural_network_based_prediction_tpu.codec import (
    contexts, decoder, encoder, rdoq)
from context_adaptive_neural_network_based_prediction_tpu.codec.rdo import (
    lambda_for_qp)
from context_adaptive_neural_network_based_prediction_tpu.ops import transform
from context_adaptive_neural_network_based_prediction_tpu.utils import metrics


def natural(h, w, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    f = 120 + 50 * np.sin(xx / 7.0) + 35 * np.cos(yy / 11.0) + rng.normal(0, 5, (h, w))
    return np.clip(f, 0, 255).astype(np.uint8)


class TestRdoqUnit:
    def run_rdoq(self, coeffs, qp=32, mode=0):
        ctx = contexts.make_context_states(qp)
        return rdoq.rdoq(coeffs, qp, mode, lambda_for_qp(qp), ctx)

    def test_zero_input_zero_output(self):
        q = self.run_rdoq(np.zeros((8, 8), np.int32))
        assert not q.any()

    def test_levels_at_most_scalar_ceiling(self):
        # RDOQ levels never exceed the round-half-up scalar level.
        rng = np.random.default_rng(0)
        for n in (4, 8, 16, 32):
            coeffs = rng.integers(-4000, 4000, (n, n)).astype(np.int32)
            q = self.run_rdoq(coeffs, qp=30)
            qp = 30
            per, rem = qp // 6, qp % 6
            qbits = 14 + per + transform.transform_shift(int(np.log2(n)))
            ceil = (np.abs(coeffs).astype(np.int64) * transform.QUANT_SCALES[rem]
                    + (1 << (qbits - 1))) >> qbits
            assert np.all(np.abs(q) <= ceil)
            # Signs follow the source coefficients.
            nz = q != 0
            assert np.all(np.sign(q[nz]) == np.sign(coeffs[nz]))

    def test_small_coefficients_dropped(self):
        # A lone tiny high-frequency coefficient is not worth its rate.
        coeffs = np.zeros((8, 8), np.int32)
        coeffs[7, 7] = 300  # would scalar-quantize to a small level at QP 37
        q = self.run_rdoq(coeffs, qp=37)
        assert not q.any()

    def test_strong_dc_survives(self):
        coeffs = np.zeros((8, 8), np.int32)
        coeffs[0, 0] = 20000
        q = self.run_rdoq(coeffs, qp=32)
        assert q[0, 0] > 0

    def test_nonzeros_bounded_by_round_half_ceiling(self):
        # RDOQ can only place levels where the round-half quantizer would
        # (its per-coefficient ceiling); it usually places fewer.
        rng = np.random.default_rng(1)
        coeffs = (transform.forward_transform_np(
            rng.integers(-100, 100, (1, 16, 16)).astype(np.int32)))[0]
        q_rdoq = self.run_rdoq(coeffs, qp=32)
        qp = 32
        per, rem = qp // 6, qp % 6
        qbits = 14 + per + transform.transform_shift(4)
        ceil = (np.abs(coeffs).astype(np.int64) * transform.QUANT_SCALES[rem]
                + (1 << (qbits - 1))) >> qbits
        assert np.count_nonzero(q_rdoq) <= np.count_nonzero(ceil)


class TestRdoqInEncoder:
    def test_rdoq_improves_rd_cost(self):
        frame = natural(64, 64, seed=2)
        qp = 27
        lam = lambda_for_qp(qp)

        def rd_cost(res):
            sse = float(((frame.astype(int) -
                          res.reconstruction.astype(int)) ** 2).sum())
            return sse + lam * res.num_bits

        r_off = encoder.encode_frame(frame, qp, use_rdoq=False,
                                     sign_hiding=False)
        r_on = encoder.encode_frame(frame, qp, use_rdoq=True,
                                    sign_hiding=False)
        assert rd_cost(r_on) < rd_cost(r_off)

    def test_decoder_exact_with_rdoq(self):
        frame = natural(48, 64, seed=3)
        for qp in (22, 37):
            res = encoder.encode_frame(frame, qp, use_rdoq=True)
            dec = decoder.decode_frame(res.bitstream)
            np.testing.assert_array_equal(res.reconstruction, dec.reconstruction)
