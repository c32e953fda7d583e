"""Roundtrip and behavioural tests for the CABAC engine."""

import numpy as np
import pytest

from context_adaptive_neural_network_based_prediction_tpu.codec import cabac


def roundtrip(bins, ctx_indices, init_values, qp=32):
    """Encode bins with contexts, decode back, return decoded bins."""
    enc_ctx = cabac.init_contexts(qp, init_values)
    dec_ctx = cabac.init_contexts(qp, init_values)
    enc = cabac.CabacEncoder()
    for b, c in zip(bins, ctx_indices):
        if c is None:
            enc.encode_bin_ep(b)
        else:
            enc.encode_bin(b, enc_ctx, c)
    data = enc.terminate_and_finish()
    dec = cabac.CabacDecoder(data)
    out = []
    for c in ctx_indices:
        if c is None:
            out.append(dec.decode_bin_ep())
        else:
            out.append(dec.decode_bin(dec_ctx, c))
    assert dec.decode_bin_trm() == 1
    return out, data


class TestEngineRoundtrip:
    def test_context_bins(self):
        rng = np.random.default_rng(0)
        bins = rng.integers(0, 2, 500).tolist()
        ctxs = rng.integers(0, 3, 500).tolist()
        out, data = roundtrip(bins, ctxs, [107, 139, 126])
        assert out == bins
        # Skewed contexts adapt: 500 bins must compress below 500/8 + margin bytes.
        assert len(data) < 100

    def test_bypass_bins(self):
        rng = np.random.default_rng(1)
        bins = rng.integers(0, 2, 300).tolist()
        out, data = roundtrip(bins, [None] * 300, [154])
        assert out == bins
        # Bypass bins cost exactly 1 bit each (+ engine overhead).
        assert abs(len(data) - 300 / 8) < 6

    def test_skewed_source_compresses(self):
        bins = [0] * 400 + [1] * 5
        ctxs = [0] * 405
        out, data = roundtrip(bins, ctxs, [154])
        assert out == bins
        assert len(data) < 30  # far below 405/8 bytes

    def test_bins_ep_grouped(self):
        enc = cabac.CabacEncoder()
        enc.encode_bins_ep(0b1011011101, 10)
        enc.encode_bins_ep(0x3FFF, 14)
        data = enc.terminate_and_finish()
        dec = cabac.CabacDecoder(data)
        assert dec.decode_bins_ep(10) == 0b1011011101
        assert dec.decode_bins_ep(14) == 0x3FFF
        assert dec.decode_bin_trm() == 1

    def test_mixed_stream_with_adaptation(self):
        rng = np.random.default_rng(2)
        n = 2000
        bins, ctxs = [], []
        for i in range(n):
            if i % 3 == 0:
                bins.append(int(rng.random() < 0.9))
                ctxs.append(0)
            elif i % 3 == 1:
                bins.append(int(rng.random() < 0.2))
                ctxs.append(1)
            else:
                bins.append(int(rng.integers(0, 2)))
                ctxs.append(None)
        out, _ = roundtrip(bins, ctxs, [61, 154])
        assert out == bins

    def test_carry_propagation(self):
        # A long run of MPS bins in a strongly-biased context stresses the
        # 0xFF-carry buffering path.
        bins = [1] * 4096
        ctxs = [0] * 4096
        out, _ = roundtrip(bins, ctxs, [197])
        assert out == bins


class TestContextInit:
    def test_init_formula(self):
        # init value 154 -> slope 0, offset 64 -> state 64 -> p=0, MPS=1 -> 1.
        assert cabac.init_context_state(32, 154) == 1
        # Monotone in qp for positive slope.
        s_low = cabac.init_context_state(20, 197)
        s_high = cabac.init_context_state(40, 197)
        assert s_low != s_high

    def test_states_valid(self):
        for qp in (0, 17, 32, 51):
            for iv in (61, 79, 107, 110, 126, 139, 141, 154, 179, 197, 227):
                s = cabac.init_context_state(qp, iv)
                assert 0 <= s <= 127


class TestRateEstimate:
    def test_entropy_bits_reasonable(self):
        # State 0/1 is near 50/50: ~0.96/1.05 bit.
        b0 = cabac.estimate_bin_bits(0, 0) / 32768.0
        b1 = cabac.estimate_bin_bits(0, 1) / 32768.0
        assert 0.9 < b0 < 1.0 < b1 < 1.1
        # A deeply-adapted state codes its MPS almost free.
        assert cabac.estimate_bin_bits(126, 0) / 32768.0 < 0.05
        assert cabac.estimate_bin_bits(126, 1) / 32768.0 > 3.0

    def test_estimate_tracks_actual(self):
        # Total estimated bits must approximate the real encoded size.
        rng = np.random.default_rng(3)
        bins = [int(rng.random() < 0.8) for _ in range(3000)]
        ctx = cabac.init_contexts(32, [154])
        est = 0
        for b in bins:
            est += cabac.estimate_bin_bits(int(ctx[0]), b)
            ctx[0] = (cabac.NEXT_STATE_MPS[ctx[0]] if b == (ctx[0] & 1)
                      else cabac.NEXT_STATE_LPS[ctx[0]])
        enc_ctx = cabac.init_contexts(32, [154])
        enc = cabac.CabacEncoder()
        for b in bins:
            enc.encode_bin(b, enc_ctx, 0)
        data = enc.terminate_and_finish()
        est_bits = est / 32768.0
        actual_bits = len(data) * 8
        assert abs(est_bits - actual_bits) / actual_bits < 0.05
