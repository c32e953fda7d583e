"""Native (C++) HM-slice decode path: parity with the pure-Python decoder.

native/hm_parse.cpp carries the whole CABAC parse (and, for the regular
policy, reconstruction) of an HM I-slice.  These tests pin byte-identity of
every surface the module exposes against the Python reference implementation:
full decode, parse-only + Python replay, and the native deblocking filter.
"""

import glob
import os

import numpy as np
import pytest

from context_adaptive_neural_network_based_prediction_tpu.codec import (
    deblock, hm_decoder, native)

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden_hm")
CASES = sorted(os.path.splitext(os.path.basename(p))[0]
               for p in glob.glob(os.path.join(GOLDEN_DIR, "*.bin")))

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def _stream(name):
    with open(os.path.join(GOLDEN_DIR, f"{name}.bin"), "rb") as f:
        return f.read()


@pytest.mark.parametrize("name", CASES)
def test_native_matches_python_decoder(name):
    stream = _stream(name)
    rn = hm_decoder.decode_hm_stream(stream, use_native="always")
    rp = hm_decoder.decode_hm_stream(stream, use_native="never")
    assert rn.hash_checked and rn.hash_ok
    assert np.array_equal(rn.reconstruction, rp.reconstruction)
    assert np.array_equal(rn.mode_map, rp.mode_map)
    if rp.reconstruction_cb is not None:
        assert np.array_equal(rn.reconstruction_cb, rp.reconstruction_cb)
        assert np.array_equal(rn.reconstruction_cr, rp.reconstruction_cr)


@pytest.mark.parametrize("name", ["128_full_q32", "420_128_full_q32"])
def test_parse_only_replay_matches_full_native(name):
    """The TU-record replay path (used for NN policies) reconstructs the same
    picture as the all-C++ path on regular streams."""
    stream = _stream(name)
    dec = hm_decoder.HmFrameDecoder(stream)
    res = native.hm_decode_slice_native(
        dec.sh.slice_data, width=dec.w, height=dec.h, ctu_size=dec.ctu,
        log2_min_cb=dec.sps.log2_min_cb, log2_max_tb=dec.sps.log2_max_tb,
        log2_min_tb=dec.sps.log2_min_tb,
        max_tr_depth_intra=dec.sps.max_transform_hierarchy_depth_intra,
        chroma=dec.chroma, qp=dec.qp,
        qp_cb=dec.qp_cb if dec.chroma else 0,
        qp_cr=dec.qp_cr if dec.chroma else 0,
        transform_skip_enabled=dec.pps.transform_skip_enabled,
        sign_data_hiding=dec.pps.sign_data_hiding,
        sao_luma=dec.sh.sao_luma, sao_chroma=dec.sh.sao_chroma,
        strong_intra_smoothing=dec.sps.strong_intra_smoothing,
        policy=0, reconstruct=False)
    assert res["recon_y"] is None  # parse-only
    dec._replay_records(res["tu_meta"], res["coeffs"])

    full = hm_decoder.decode_hm_stream(stream, use_native="always")
    # Compare the pre-loop-filter reconstruction against the C++ one by
    # re-running the same finish on the replayed state.
    dec.mode_map = res["mode_map"]
    dec.tu_map = res["tu_map"]
    n_ctu_x = (dec.w + dec.ctu - 1) // dec.ctu
    n_ctu_y = (dec.h + dec.ctu - 1) // dec.ctu
    from context_adaptive_neural_network_based_prediction_tpu.codec import (
        sao as sao_mod)

    def grid(comp):
        return [[sao_mod.SaoParams(
            int(res["sao"][cy * n_ctu_x + cx, comp, 0]),
            int(res["sao"][cy * n_ctu_x + cx, comp, 1]),
            tuple(int(v) for v in res["sao"][cy * n_ctu_x + cx, comp, 2:6]))
            for cx in range(n_ctu_x)] for cy in range(n_ctu_y)]

    if dec.sh.sao_luma:
        dec.sao_grid = grid(0)
    if dec.chroma and dec.sh.sao_chroma:
        dec.sao_grid_cb = grid(1)
        dec.sao_grid_cr = grid(2)
    replayed = dec._finish()
    assert replayed.hash_checked and replayed.hash_ok
    assert np.array_equal(replayed.reconstruction, full.reconstruction)


def test_native_deblock_parity_fuzz():
    rng = np.random.default_rng(7)
    for _ in range(6):
        h = int(rng.choice([32, 64, 96]))
        w = int(rng.choice([32, 64, 128]))
        plane = rng.integers(0, 256, (h, w)).astype(np.uint8)
        tu = rng.integers(0, 7, ((h + 3) // 4, (w + 3) // 4)).astype(np.int32)
        qp = int(rng.integers(8, 51))
        assert np.array_equal(
            deblock.deblock_luma(plane, tu, qp, use_native=True),
            deblock.deblock_luma(plane, tu, qp, use_native=False))
        cpl = plane[:h // 2 * 2 // 2, :w // 2 * 2 // 2]
        assert np.array_equal(
            deblock.deblock_chroma(cpl, tu, qp, use_native=True),
            deblock.deblock_chroma(cpl, tu, qp, use_native=False))


@pytest.mark.parametrize("policy", ["substitution", "switch"])
def test_native_nn_policy_replay_matches_python(policy):
    """NN-policy streams decode through C++ parse + Python/JAX PNN replay and
    still match the pure-Python decoder bit-exactly."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from context_adaptive_neural_network_based_prediction_tpu.codec import (
        hm_encoder)
    from tests.test_hm_interop import _library_crop, _shipped_pnn

    pnn = _shipped_pnn()
    frame = _library_crop(64, 96)
    stream, result = hm_encoder.encode_frame_hm(frame, 37, policy=policy,
                                                pnn=pnn)
    rn = hm_decoder.decode_hm_stream(stream, policy=policy, pnn=pnn,
                                     use_native="always")
    rp = hm_decoder.decode_hm_stream(stream, policy=policy, pnn=pnn,
                                     use_native="never")
    assert rn.hash_checked and rn.hash_ok
    assert np.array_equal(rn.reconstruction, rp.reconstruction)
    assert np.array_equal(rn.reconstruction, result.reconstruction)
    assert np.array_equal(rn.mode_map, rp.mode_map)


def test_native_tree_packer_matches_python_serializer():
    """pack_tree_grids walks the decided grids directly and must be
    byte-identical to `encoder.serialize_trees` over the CuNode trees
    (quadtree splits, NxN partitions, switch-policy PNNS flag + MPM
    special cases, forced TU32s under 64-CUs, sign-data hiding)."""
    import jax

    from context_adaptive_neural_network_based_prediction_tpu.codec import (
        encoder as enc_mod, native, nn_intra)
    from context_adaptive_neural_network_based_prediction_tpu.models import (
        pnn)
    from context_adaptive_neural_network_based_prediction_tpu.parallel import (
        wavefront2)

    if not native.available():
        import pytest

        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(7)
    yy, xx = np.mgrid[0:64, 0:128]
    frame = np.clip(128 + 50 * np.sin(xx / 9.0) + 30 * np.cos(yy / 7.0)
                    + rng.normal(0, 8, (64, 128)), 0, 255).astype(np.uint8)
    params = {8: pnn.init_params(jax.random.PRNGKey(1), 8, False)}
    bundle = nn_intra.PnnBundle(params, {8: False}, 117.9).quantize(
        n_samples=32)
    for policy, ctb in (("regular", 32), ("switch", 32), ("regular", 64)):
        pnn_arg = bundle if policy != "regular" else None
        run = wavefront2._jitted_wavefront2(
            64, 128, 37, 1.0, policy, pnn_arg, ctb=ctb)
        recon, ys = run(np.asarray(frame))
        grids = wavefront2._assemble_arrays(
            jax.tree_util.tree_map(np.asarray, ys), 64, 128, ctb)
        res = wavefront2.encode_frame_wavefront2(
            frame, 37, policy=policy, pnn=pnn_arg, ctb=ctb, serialize=False)
        py_stream = enc_mod.serialize_trees(
            res.ctu_trees, width=128, height=64, qp=37, policy=policy,
            ctu_size=ctb, sign_hiding=True)
        hdr = enc_mod.stream_header(width=128, height=64, qp=37,
                                    policy=policy, ctu_size=ctb,
                                    sign_hiding=True)
        nat = native.pack_tree_payload(grids, width=128, height=64, qp=37,
                                       ctu_size=ctb, policy=policy)
        assert hdr + nat == py_stream, (policy, ctb)
