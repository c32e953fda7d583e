"""Tests for the PNN model family, losses, training and checkpoint import.

Coverage mirrors the reference's `test_pnn.py` (per-layer shape/behaviour,
full-graph prediction) plus real-weight parity: the shipped TF checkpoints for
the 4x4 and 8x8 convolutional PNNs are imported and the JAX forward must match
a numpy/TF-free oracle of the reference graph to float tolerance.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from context_adaptive_neural_network_based_prediction_tpu.models import (
    pnn, losses, training, zoo)

CKPT8 = ("/root/reference/pnn/results/width_target_8/convolutional/single/"
         "luminance/1_0/masks_tr_random/model_800000.ckpt")
CKPT4 = ("/root/reference/pnn/results/width_target_4/convolutional/single/"
         "luminance/1_0/masks_tr_random/model_800000.ckpt")


def _has_tf():
    try:
        import tensorflow  # noqa: F401
        return True
    except Exception:
        return False


class TestFullyConnected:
    def test_shapes_and_linearity_of_last_layer(self):
        key = jax.random.PRNGKey(0)
        params = pnn.init_params(key, 8, True)
        x = jnp.zeros((3, 320))
        out = pnn.forward(params, x, 8, True)
        assert out.shape == (3, 8, 8, 1)
        # Zero input -> output is exactly the bias chain (biases are zero at
        # init, so output must be 0).
        np.testing.assert_allclose(np.asarray(out), 0.0)

    def test_leaky_relu_slope(self):
        x = jnp.array([-10.0, -1.0, 0.0, 2.0])
        np.testing.assert_allclose(np.asarray(pnn.leaky_relu(x)), [-1.0, -0.1, 0.0, 2.0])

    def test_init_distributions(self):
        params = pnn.init_params(jax.random.PRNGKey(1), 8, True)["fully_connected"]
        assert params["weights_0"].shape == (320, 1200)
        assert params["weights_3"].shape == (1200, 64)
        assert float(jnp.std(params["weights_0"])) == pytest.approx(0.01, rel=0.1)
        assert float(jnp.std(params["weights_1"])) == pytest.approx(0.029, rel=0.1)


class TestConvolutional:
    @pytest.mark.parametrize("w", [4, 8, 16, 32])
    def test_output_shape(self, w):
        params = pnn.init_params(jax.random.PRNGKey(2), w, False)
        above = jnp.zeros((2, w, 3 * w, 1))
        left = jnp.zeros((2, 2 * w, w, 1))
        out = pnn.forward(params, (above, left), w, False)
        assert out.shape == (2, w, w, 1)

    def test_branch_feature_map_counts(self):
        # w=16, strides (2,1,2,1): maps 64,64,128,128.
        params = pnn.init_params(jax.random.PRNGKey(3), 16, False)["convolutional"]
        ba = params["branch_above"]
        assert ba["convolution_0"]["weights"].shape == (5, 5, 1, 64)
        assert ba["convolution_1"]["weights"].shape == (3, 3, 64, 64)
        assert ba["convolution_2"]["weights"].shape == (5, 5, 64, 128)
        assert ba["convolution_3"]["weights"].shape == (3, 3, 128, 128)
        cm = params["merger"]["channelwise_fully_connected_merger"]
        # Above out 4x12, left out 8x4 -> 80 inputs; target/prod = 4 -> 16 out.
        assert cm["weights"].shape == (128, 80, 16)
        tc = params["merger"]["transpose_convolution_3"]
        assert tc["weights"].shape == (5, 5, 1, 64)

    def test_merger_matches_naive_loop(self):
        rng = np.random.default_rng(0)
        n, h0, w0, h1, w1, m, o = 2, 2, 6, 4, 2, 3, 4
        x0 = rng.normal(size=(n, h0, w0, m)).astype(np.float32)
        x1 = rng.normal(size=(n, h1, w1, m)).astype(np.float32)
        weights = rng.normal(size=(m, h0 * w0 + h1 * w1, o)).astype(np.float32)
        biases = rng.normal(size=(m, o)).astype(np.float32)
        out = np.asarray(pnn.channelwise_fc_merger(
            jnp.asarray(weights), jnp.asarray(biases),
            jnp.asarray(x0), jnp.asarray(x1), 2, 2))
        for i in range(n):
            for mm in range(m):
                v = np.concatenate([x0[i, :, :, mm].reshape(-1), x1[i, :, :, mm].reshape(-1)])
                expect = v @ weights[mm] + biases[mm]
                np.testing.assert_allclose(out[i, :, :, mm].reshape(-1), expect, rtol=1e-5, atol=1e-5)

    def test_transpose_conv_is_adjoint_of_conv(self):
        # <conv(x), y> == <x, tconv(y)> for all x, y (exact transpose pair).
        rng = np.random.default_rng(1)
        w = jnp.asarray(rng.normal(size=(5, 5, 3, 2)).astype(np.float32))  # (k,k,out=3? no: in->out)
        x = jnp.asarray(rng.normal(size=(1, 8, 8, 3)).astype(np.float32))
        y = jnp.asarray(rng.normal(size=(1, 4, 4, 2)).astype(np.float32))
        cx = pnn.conv2d_same(x, w, 2)                      # (1,4,4,2)
        ty = pnn.conv2d_transpose_same(y, w, 2)            # (1,8,8,3)
        lhs = float(jnp.sum(cx * y))
        rhs = float(jnp.sum(x * ty))
        assert lhs == pytest.approx(rhs, rel=1e-5)


@pytest.mark.skipif(not _has_tf(), reason="tensorflow unavailable for ckpt read")
class TestCheckpointParity:
    @pytest.mark.parametrize("ckpt,w", [(CKPT4, 4), (CKPT8, 8)])
    def test_imported_weights_reproduce_reference_graph(self, ckpt, w):
        from context_adaptive_neural_network_based_prediction_tpu.models import importer

        params = importer.import_tf_checkpoint(ckpt)
        rng = np.random.default_rng(0)
        above = rng.normal(0, 30, (2, w, 3 * w, 1)).astype(np.float32)
        left = rng.normal(0, 30, (2, 2 * w, w, 1)).astype(np.float32)
        ours = np.asarray(pnn.conv_forward(params["convolutional"], above, left, w))
        ref = _reference_conv_oracle(params["convolutional"], above, left, w)
        assert np.abs(ours - ref).max() < 1e-3
        # Predictions must be non-trivial (trained net on strong context).
        assert np.abs(ref).max() > 1.0


def _reference_conv_oracle(p, above, left, w):
    """Numpy oracle of the reference conv graph via scipy-free direct conv."""
    strides = pnn.STRIDES_BRANCH[w]

    def lrelu(x):
        return np.maximum(0.1 * x, x)

    def conv(x, wgt, s):
        k = wgt.shape[0]
        n, h, ww, cin = x.shape
        ho, wo = h // s, ww // s
        pb_h, pe_h = pnn._tf_same_pads(h, s, k)
        pb_w, pe_w = pnn._tf_same_pads(ww, s, k)
        xp = np.pad(x, ((0, 0), (pb_h, pe_h), (pb_w, pe_w), (0, 0)))
        out = np.zeros((n, ho, wo, wgt.shape[3]), np.float32)
        for y in range(ho):
            for xx in range(wo):
                patch = xp[:, y * s:y * s + k, xx * s:xx * s + k, :]
                out[:, y, xx, :] = np.tensordot(patch, wgt, axes=([1, 2, 3], [0, 1, 2]))
        return out

    def tconv(y, wgt, s):
        # Adjoint of conv: scatter each input position into the padded output.
        k = wgt.shape[0]
        n, h, ww, cin = y.shape
        ho, wo = h * s, ww * s
        pb_h, pe_h = pnn._tf_same_pads(ho, s, k)
        pb_w, pe_w = pnn._tf_same_pads(wo, s, k)
        out_p = np.zeros((n, ho + pb_h + pe_h, wo + pb_w + pe_w, wgt.shape[2]), np.float32)
        for yy in range(h):
            for xx in range(ww):
                contrib = np.tensordot(y[:, yy, xx, :], wgt, axes=([1], [3]))  # (n,k,k,out)
                out_p[:, yy * s:yy * s + k, xx * s:xx * s + k, :] += contrib
        return out_p[:, pb_h:pb_h + ho, pb_w:pb_w + wo, :]

    x0, x1 = above, left
    for i, s in enumerate(strides):
        x0 = lrelu(conv(x0, p["branch_above"][f"convolution_{i}"]["weights"], s)
                   + p["branch_above"][f"convolution_{i}"]["biases"])
        x1 = lrelu(conv(x1, p["branch_left"][f"convolution_{i}"]["weights"], s)
                   + p["branch_left"][f"convolution_{i}"]["biases"])
    cm = p["merger"]["channelwise_fully_connected_merger"]
    n, h0, w0, m = x0.shape
    wo_ch = w // int(np.prod(strides))
    out = np.zeros((n, wo_ch * wo_ch, m), np.float32)
    for mm in range(m):
        v = np.concatenate([x0[:, :, :, mm].reshape(n, -1), x1[:, :, :, mm].reshape(n, -1)], axis=1)
        out[:, :, mm] = v @ cm["weights"][mm] + cm["biases"][mm]
    x = lrelu(out.reshape(n, wo_ch, wo_ch, m))
    sm = strides[::-1]
    for i, s in enumerate(sm):
        layer = p["merger"][f"transpose_convolution_{i}"]
        x = tconv(x, layer["weights"], s) + layer["biases"]
        if i != len(sm) - 1:
            x = lrelu(x)
    return x


class TestLosses:
    def test_l2_norm_error(self):
        t = jnp.ones((2, 4, 4, 1))
        p = jnp.zeros((2, 4, 4, 1))
        # Each example: sqrt(16) = 4.
        assert float(losses.prediction_error_l2_norm(t, p)) == pytest.approx(4.0)

    def test_gradient_error_zero_for_shifted(self):
        # Adding a constant leaves all finite-difference gradients unchanged.
        rng = np.random.default_rng(0)
        t = jnp.asarray(rng.normal(size=(2, 8, 8, 1)).astype(np.float32))
        p = t + 5.0
        assert float(losses.prediction_error_gradient(t, p)) == pytest.approx(0.0, abs=1e-4)

    def test_gradient_error_known_value(self):
        t = jnp.zeros((1, 2, 2, 1))
        p = jnp.asarray(np.array([[0.0, 1.0], [0.0, 0.0]], np.float32).reshape(1, 2, 2, 1))
        # diffs: 0deg rows: |1-0|+0=1... computed per direction:
        # 0deg: |1| + |0| = 1; 45deg: |1-0| = 1; 90deg: |1-0|=1; 135deg: |0|=0.
        assert float(losses.prediction_error_gradient(t, p)) == pytest.approx(3.0)

    def test_weight_decay_only_weights(self):
        params = {"scope": {"weights_0": jnp.ones((2, 2)), "biases_0": jnp.ones((7,))}}
        # 5e-4 * 0.5 * 4 = 1e-3
        _, terms = losses.total_loss(params, jnp.zeros((1, 1, 1, 1)),
                                     jnp.ones((1, 1, 1, 1)), 1.0, 0.0)
        assert float(terms["weight_decay"]) == pytest.approx(1e-3)

    def test_coeff_validation(self):
        with pytest.raises(ValueError):
            losses.total_loss({}, jnp.zeros((1, 1, 1, 1)), jnp.zeros((1, 1, 1, 1)), 0.0, 0.0)


class TestTraining:
    def test_lr_schedule_boundaries(self):
        sched = training.learning_rate_schedule(8)
        assert float(sched(0)) == pytest.approx(1e-4)
        assert float(sched(400_000)) == pytest.approx(1e-5)
        assert float(sched(600_000)) == pytest.approx(1e-6)
        assert float(sched(700_000)) == pytest.approx(1e-7)
        sched16 = training.learning_rate_schedule(16)
        assert float(sched16(0)) == pytest.approx(4e-4)
        assert float(sched16(799_999)) == pytest.approx(4e-7)

    def test_train_step_reduces_loss_fc(self):
        w = 4
        rng = np.random.default_rng(0)
        above = rng.integers(0, 256, (32, w, 3 * w, 1), dtype=np.uint8)
        left = rng.integers(0, 256, (32, 2 * w, w, 1), dtype=np.uint8)
        targets = rng.integers(0, 256, (32, w, w, 1), dtype=np.uint8)
        state = training.init_state(jax.random.PRNGKey(0), w, True)
        key = jax.random.PRNGKey(1)
        first_loss = None
        for i in range(30):
            key, sub = jax.random.split(key)
            state, loss, terms = training.train_step(
                state, sub, above, left, targets, 117.9, jnp.array([0, 0]),
                width_target=w, is_fully_connected=True,
                coeff_l2=1.0, coeff_grad=0.0, random_masks=False)
            if first_loss is None:
                first_loss = float(loss)
        assert float(loss) < first_loss
        assert int(state.step) == 30

    def test_train_step_conv_with_random_masks(self):
        w = 4
        rng = np.random.default_rng(1)
        above = rng.integers(0, 256, (8, w, 3 * w, 1), dtype=np.uint8)
        left = rng.integers(0, 256, (8, 2 * w, w, 1), dtype=np.uint8)
        targets = rng.integers(0, 256, (8, w, w, 1), dtype=np.uint8)
        state = training.init_state(jax.random.PRNGKey(2), w, False)
        state, loss, _ = training.train_step(
            state, jax.random.PRNGKey(3), above, left, targets, 117.9,
            jnp.array([0, 0]), width_target=w, is_fully_connected=False,
            coeff_l2=1.0, coeff_grad=1.0, random_masks=True)
        assert np.isfinite(float(loss))

    def test_checkpoint_roundtrip(self, tmp_path):
        state = training.init_state(jax.random.PRNGKey(4), 4, True)
        state = state._replace(step=jnp.asarray(12345, jnp.int32))
        path = training.save_checkpoint(state, str(tmp_path))
        assert path.endswith("model_12345.ckpt.pkl")
        found, step = training.find_latest_checkpoint(str(tmp_path))
        assert found == path and step == 12345
        restored = training.restore_checkpoint(path, 4)
        assert int(restored.step) == 12345
        for a, b in zip(jax.tree_util.tree_leaves(restored.params),
                        jax.tree_util.tree_leaves(state.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))


class TestZoo:
    def test_model_directory_convention(self):
        d = zoo.model_directory("pnn/results", 8, True, False, "luminance", 1.0, 0.0, None)
        assert d == "pnn/results/width_target_8/fully_connected/single/luminance/1_0/masks_tr_random"
        d2 = zoo.model_directory("r", 16, False, True, "luminance", 1.0, 0.0, (4, 8))
        assert d2 == "r/width_target_16/convolutional/pair/luminance/1_0/masks_tr_4_8"

    def test_predict_by_batch_chunks(self):
        params = pnn.init_params(jax.random.PRNGKey(5), 4, True)
        x = np.random.default_rng(0).normal(size=(10, 80)).astype(np.float32)
        out_full = zoo.predict_by_batch(params, x, 4, True, batch_size=1024)
        out_chunk = zoo.predict_by_batch(params, x, 4, True, batch_size=3)
        np.testing.assert_allclose(out_full, out_chunk, rtol=1e-6, atol=1e-6)


def test_ipfcn_caffemodel_import():
    """The shipped IPFCN-S caffemodel parses without pycaffe and its weights
    predict far better than chance (reference ipfcns/ipfcns.py:388-430)."""
    import os

    import jax

    from context_adaptive_neural_network_based_prediction_tpu.models import (
        ipfcn)

    path = ("/root/reference/ipfcns/models/ipfcns/"
            "IntraFCN205_Size4_iter_1638700.caffemodel")
    if not os.path.exists(path):
        import pytest

        pytest.skip("reference caffemodel not mounted")
    params = ipfcn.import_caffemodel(path)
    assert params["fc1_weights"].shape == (192, 512)
    assert params["fc4_weights"].shape == (512, 16)
    assert params["prelu1_slopes"].shape == (512,)
    # functional: beats random init on a real photo by a wide margin
    import numpy as np

    from context_adaptive_neural_network_based_prediction_tpu.utils import (
        color, images)

    rgb = images.read_image_mode(
        "/root/reference/hevc/pseudo_data/rgb_library.jpg", "RGB")
    luma = color.rgb_to_ycbcr(rgb)[:, :, 0:1]
    rng = np.random.default_rng(0)
    ga, gl, tgt = [], [], []
    for _ in range(50):
        r = int(rng.integers(0, luma.shape[0] - 16))
        c = int(rng.integers(0, luma.shape[1] - 16))
        a, l = ipfcn.extract_pair_groups_lines_from_channel(luma, 4, r, c)
        ga.append(a)
        gl.append(l)
        tgt.append(luma[r + 8:r + 12, c + 8:c + 12, 0])
    ga, gl = np.stack(ga), np.stack(gl)
    tgt = np.stack(tgt).astype(np.float64)

    def mean_psnr(p):
        pred = ipfcn.predict_uint8(p, ga, gl, 4).astype(np.float64)
        mse = ((pred - tgt) ** 2).mean(axis=(1, 2))
        return float((10 * np.log10(255 * 255 / (mse + 1e-6))).mean())

    psnr_real = mean_psnr(params)
    psnr_rand = mean_psnr(ipfcn.init_params(jax.random.PRNGKey(0), 4))
    assert psnr_real > psnr_rand + 4.0
