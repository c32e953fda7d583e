"""Chroma (4:2:0) coding unit tests."""

import numpy as np
import pytest

from context_adaptive_neural_network_based_prediction_tpu.codec import (
    cabac, syntax)
from context_adaptive_neural_network_based_prediction_tpu.codec.contexts import (
    make_context_states)
from context_adaptive_neural_network_based_prediction_tpu.codec.hm_decoder import (
    CHROMA_SCALE_420, chroma_mode_from_index, chroma_qp_420)


@pytest.mark.parametrize("n", [4, 8, 16])
@pytest.mark.parametrize("mode", [0, 1, 10, 26])
def test_chroma_coefficients_roundtrip(n, mode):
    rng = np.random.default_rng(n * 100 + mode)
    for _ in range(5):
        c = ((rng.random((n, n)) < 0.3)
             * rng.integers(-25, 25, (n, n))).astype(np.int32)
        if not c.any():
            c[0, 0] = 3
        enc = cabac.CabacEncoder()
        ctx = make_context_states(30)
        syntax.encode_coefficients(enc, ctx, c, mode, False,
                                   channel=syntax.CHROMA)
        data = enc.terminate_and_finish()
        dec = cabac.CabacDecoder(data)
        ctx2 = make_context_states(30)
        out = syntax.decode_coefficients(dec, ctx2, n, mode, False,
                                         channel=syntax.CHROMA)
        assert np.array_equal(c, out)
        assert np.array_equal(ctx, ctx2)


def test_chroma_scan_is_diagonal_above_4x4():
    # Mode-dependent scans apply to chroma only at 4x4 (HM getCoefScanIdx).
    from context_adaptive_neural_network_based_prediction_tpu.codec import (
        scans)

    assert syntax._scan_for(26, 8, syntax.CHROMA) == scans.SCAN_DIAG
    assert syntax._scan_for(26, 4, syntax.CHROMA) == \
        syntax._scan_for(26, 4, syntax.LUMA)


def test_chroma_qp_table():
    # Rec. H.265 Table 8-10 spot values for 4:2:0.
    assert chroma_qp_420(29) == 29
    assert chroma_qp_420(30) == 29
    assert chroma_qp_420(33) == 32
    assert chroma_qp_420(37) == 34
    assert chroma_qp_420(43) == 37
    assert chroma_qp_420(51) == 45
    assert chroma_qp_420(51, offset=6) == 51
    assert CHROMA_SCALE_420.shape == (58,)


def test_chroma_mode_derivation():
    # DM
    assert chroma_mode_from_index(4, 17) == 17
    # candidate list {planar, ver, hor, dc}; luma collision -> angular 34
    assert chroma_mode_from_index(0, 17) == 0
    assert chroma_mode_from_index(0, 0) == 34
    assert chroma_mode_from_index(1, 26) == 34
    assert chroma_mode_from_index(2, 10) == 34
    assert chroma_mode_from_index(3, 1) == 34
    assert chroma_mode_from_index(3, 2) == 1


def test_chroma_deblock_matches_hm_shape():
    from context_adaptive_neural_network_based_prediction_tpu.codec import (
        deblock)

    rng = np.random.default_rng(0)
    plane = rng.integers(0, 256, (32, 32), dtype=np.uint8)
    tu_map = np.arange(16 * 16).reshape(16, 16)  # every 4x4 luma unit distinct
    out = deblock.deblock_chroma(plane, tu_map, 30)
    assert out.shape == plane.shape
    # only columns/rows adjacent to the 8-chroma-sample grid may change
    changed = np.argwhere(out != plane)
    for (y, x) in changed:
        assert (x in (7, 8, 15, 16, 23, 24)) or (y in (7, 8, 15, 16, 23, 24))


# ------------------------------------------------- switch chroma (PNNS) ----

def test_switch_chroma_candidate_list():
    """{Planar, DC, Ver, 35, DM} with HOR collision-substitution
    (hm_16_15_switch/.../TComDataCU.cpp:1364-1400)."""
    from context_adaptive_neural_network_based_prediction_tpu.codec.hm_decoder import (
        chroma_mode_from_index)

    # Non-colliding luma mode: slots map straight through.
    assert [chroma_mode_from_index(i, 18, "switch") for i in range(5)] == \
        [0, 1, 26, 35, 18]
    # Collisions replace the slot with HORIZONTAL (10).
    assert chroma_mode_from_index(0, 0, "switch") == 10     # planar
    assert chroma_mode_from_index(1, 1, "switch") == 10     # dc
    assert chroma_mode_from_index(2, 26, "switch") == 10    # ver
    assert chroma_mode_from_index(3, 35, "switch") == 10    # PNNS luma
    # DM of a PNNS luma PU is PNNS chroma.
    assert chroma_mode_from_index(4, 35, "switch") == 35
    # Regular list unchanged.
    assert chroma_mode_from_index(3, 18) == 1


def test_switch_chroma_420_roundtrip():
    """Own-container 4:2:0 switch stream decodes bit-exactly (all planes)."""
    from tests.test_codec import toy_pnn_predictor
    from context_adaptive_neural_network_based_prediction_tpu.codec import (
        hm_decoder, hm_encoder)

    rng = np.random.default_rng(3)
    ycc = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    pnn_pred = toy_pnn_predictor()
    stream, res, rec_cb, rec_cr = hm_encoder.encode_frame_hm_420(
        ycc, 32, policy="switch", pnn=pnn_pred)
    out = hm_decoder.decode_hm_stream(stream, policy="switch", pnn=pnn_pred)
    assert np.array_equal(out.reconstruction, res.reconstruction)
    assert np.array_equal(out.reconstruction_cb, rec_cb)
    assert np.array_equal(out.reconstruction_cr, rec_cr)


def test_switch_chroma_pnns_mode_normative(monkeypatch):
    """Forcing every chroma CU onto candidate slot 3 (= mode 35 when the
    luma mode is not 35) drives the chroma PNN forward on BOTH sides;
    encode and decode must still agree bit-exactly - the NN is normative."""
    from tests.test_codec import toy_pnn_predictor
    from context_adaptive_neural_network_based_prediction_tpu.codec import (
        chroma_enc, hm_decoder, hm_encoder)

    def forced(self, luma_mode):
        if luma_mode != 35:
            return [(3, 35)]
        return [(4, 35)]

    monkeypatch.setattr(chroma_enc.ChromaPass, "_candidates", forced)
    rng = np.random.default_rng(7)
    ycc = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    pnn_pred = toy_pnn_predictor()
    stream, res, rec_cb, rec_cr = hm_encoder.encode_frame_hm_420(
        ycc, 27, policy="switch", pnn=pnn_pred)
    out = hm_decoder.decode_hm_stream(stream, policy="switch", pnn=pnn_pred)
    assert np.array_equal(out.reconstruction_cb, rec_cb)
    assert np.array_equal(out.reconstruction_cr, rec_cr)
