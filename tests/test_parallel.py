"""Tests for the wavefront encoder, tiled sharding and sharded training."""

import numpy as np
import pytest
import jax

from context_adaptive_neural_network_based_prediction_tpu.codec import decoder
from context_adaptive_neural_network_based_prediction_tpu.parallel import (
    mesh as mesh_mod, sharded_training, tiled, wavefront, wavefront2)
from context_adaptive_neural_network_based_prediction_tpu.utils import metrics


def natural(h, w, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    f = 120 + 50 * np.sin(xx / 7.0) + 35 * np.cos(yy / 11.0) + rng.normal(0, 5, (h, w))
    return np.clip(f, 0, 255).astype(np.uint8)


class TestWavefront:
    def test_decoder_bit_exact(self):
        frame = natural(64, 96, seed=1)
        res = wavefront.encode_frame_wavefront(frame, 32)
        dec = decoder.decode_frame(res.bitstream)
        np.testing.assert_array_equal(res.reconstruction, dec.reconstruction)

    @pytest.mark.parametrize("qp", [22, 42])
    def test_quality_and_rate_scale_with_qp(self, qp):
        frame = natural(64, 64, seed=2)
        res = wavefront.encode_frame_wavefront(frame, qp)
        psnr = metrics.compute_psnr(frame, res.reconstruction)
        if qp == 22:
            assert psnr > 36
        else:
            assert psnr > 25

    def test_matches_host_reference_recon_structures(self):
        # The wavefront availability rules equal raster-order coding: check a
        # frame whose top row and left column exercise every edge case.
        frame = natural(48, 48, seed=3)
        res = wavefront.encode_frame_wavefront(frame, 27)
        dec = decoder.decode_frame(res.bitstream)
        np.testing.assert_array_equal(res.reconstruction, dec.reconstruction)
        np.testing.assert_array_equal(res.mode_map, dec.mode_map)

    def test_flat_frame_high_quality(self):
        frame = np.full((32, 32), 77, np.uint8)
        res = wavefront.encode_frame_wavefront(frame, 22)
        assert metrics.compute_psnr(frame, res.reconstruction) > 45


class TestWavefront2:
    def test_decoder_bit_exact_and_tree_used(self):
        # High-frequency texture forces 8/16 splits; smooth area keeps 32s.
        rng = np.random.default_rng(3)
        frame = natural(64, 96, seed=3)
        frame[:32, :32] = rng.integers(0, 256, (32, 32))
        res = wavefront2.encode_frame_wavefront2(frame, 32)
        dec = decoder.decode_frame(res.bitstream)
        np.testing.assert_array_equal(res.reconstruction, dec.reconstruction)
        sizes = set()
        stack = list(res.ctu_trees)
        while stack:
            nd = stack.pop()
            if nd.split:
                stack.extend(nd.children)
            else:
                sizes.add(nd.size)
        assert 32 in sizes and 8 in sizes, sizes

    def test_hm_stream_hash_ok(self):
        from context_adaptive_neural_network_based_prediction_tpu.codec import (
            hm_decoder)

        frame = natural(64, 64, seed=4)
        stream, _res = wavefront2.encode_frame_wavefront2_hm(frame, 32)
        hd = hm_decoder.decode_hm_stream(stream)
        assert hd.hash_checked and hd.hash_ok

    def test_beats_v1_rate_on_smooth_content(self):
        # The quadtree merges smooth areas into 32-CUs: fewer bits than the
        # fixed 16-grid at equal-or-better quality on low-detail frames.
        yy, xx = np.mgrid[0:64, 0:96]
        frame = np.clip(128 + 30 * np.sin(xx / 40.0) + 20 * np.cos(yy / 50.0),
                        0, 255).astype(np.uint8)
        r1 = wavefront.encode_frame_wavefront(frame, 32)
        r2 = wavefront2.encode_frame_wavefront2(frame, 32)
        assert len(r2.bitstream) < len(r1.bitstream)


class TestTiled:
    def test_tiled_encode_runs_on_mesh(self):
        m = mesh_mod.make_mesh({"data": 4})
        frame = natural(4 * 32, 64, seed=4)
        recon, modes, qcoeffs = tiled.encode_frame_tiled(frame, 32, m)
        assert recon.shape == frame.shape
        # Tiles are independent pictures: each tile equals a single-device
        # wavefront encode of that stripe.
        for t in range(4):
            stripe = frame[t * 32:(t + 1) * 32]
            solo = wavefront.encode_frame_wavefront(stripe, 32, serialize=False)
            np.testing.assert_array_equal(recon[t * 32:(t + 1) * 32],
                                          solo.reconstruction)

    def test_psnr_reasonable(self):
        m = mesh_mod.make_mesh({"data": 2})
        frame = natural(64, 64, seed=5)
        recon, _, _ = tiled.encode_frame_tiled(frame, 27, m)
        assert metrics.compute_psnr(frame, recon) > 33

    @pytest.mark.parametrize("n_tiles", [2, 4])
    def test_halo_exchange_bit_exact(self, n_tiles):
        """ppermute halo path == single-device wavefront, bit for bit.

        The sharded stripes exchange boundary reconstruction rows every
        global step; modes, levels, and reconstruction must all match the
        unsharded encode exactly (VERDICT round-1 item 3)."""
        m = mesh_mod.make_mesh({"data": n_tiles})
        frame = natural(n_tiles * 32, 96, seed=7)
        recon, modes, qcoeffs = tiled.encode_frame_tiled_halo(frame, 32, m)
        run = wavefront._jitted_wavefront(frame.shape[0], 96, 16, 32)
        import jax.numpy as jnp

        r_s, m_s, q_s = (np.asarray(a) for a in run(jnp.asarray(frame)))
        np.testing.assert_array_equal(recon, r_s)
        np.testing.assert_array_equal(modes, m_s)
        np.testing.assert_array_equal(qcoeffs, q_s)

    def test_halo_beats_independent_tiles(self):
        """Halo exchange removes the stripe-boundary prediction restart, so
        at equal level-decisions its recon can only match the single-device
        encode; independent tiles diverge from it at the boundary."""
        m = mesh_mod.make_mesh({"data": 4})
        frame = natural(4 * 32, 64, seed=8)
        halo, _, _ = tiled.encode_frame_tiled_halo(frame, 32, m)
        indep, _, _ = tiled.encode_frame_tiled(frame, 32, m)
        solo = wavefront.encode_frame_wavefront(frame, 32, serialize=False)
        assert np.array_equal(halo, solo.reconstruction)
        assert not np.array_equal(indep, solo.reconstruction)


class TestShardedTraining:
    def test_fc_step_runs_dp_tp(self):
        m = mesh_mod.make_mesh({"data": 4, "model": 2})
        loss = sharded_training.run_sharded_demo_step(
            m, width_target=8, is_fully_connected=True, batch_size=8)
        assert np.isfinite(loss) and loss > 0

    def test_conv_step_runs(self):
        m = mesh_mod.make_mesh({"data": 4, "model": 2})
        loss = sharded_training.run_sharded_demo_step(
            m, width_target=4, is_fully_connected=False, batch_size=8)
        assert np.isfinite(loss) and loss > 0

    def test_sharded_loss_matches_single_device(self):
        # The sharded step must compute the same loss as the unsharded one.
        from context_adaptive_neural_network_based_prediction_tpu.models import (
            training)
        import jax.numpy as jnp

        w = 8
        rng = np.random.default_rng(6)
        above = rng.integers(0, 256, (8, w, 3 * w, 1), dtype=np.uint8)
        left = rng.integers(0, 256, (8, 2 * w, w, 1), dtype=np.uint8)
        targets = rng.integers(0, 256, (8, w, w, 1), dtype=np.uint8)

        m = mesh_mod.make_mesh({"data": 4, "model": 2})
        init_fn, step_fn = sharded_training.make_sharded_train_step(m, w, True)
        state_sh = init_fn(jax.random.PRNGKey(7))
        # Same params single-device (deep host copy: step_fn donates state_sh).
        host = jax.device_get(state_sh)
        state_sd = training.TrainState(host.params, host.opt_state, host.step)

        key = jax.random.PRNGKey(8)
        _, loss_sh = step_fn(state_sh, key, above, left, targets)
        _, loss_sd, _ = training.train_step(
            state_sd, key, above, left, targets, 117.895, jnp.array([0, 0]),
            width_target=w, is_fully_connected=True,
            coeff_l2=1.0, coeff_grad=0.0, random_masks=True)
        assert float(loss_sh) == pytest.approx(float(loss_sd), rel=1e-5)


class TestGraftEntry:
    def test_entry_compiles(self):
        import sys
        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as g

        fn, args = g.entry()
        out = jax.jit(fn)(*args)
        assert out.shape == (64, 16, 16, 1)

    def test_dryrun_multichip(self):
        import sys
        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as g

        g.dryrun_multichip(8)


def test_production_sharded_chunk_trains():
    """The DP x TP production chunk (`make_sharded_train_chunk`) actually
    TRAINS: several fused sharded updates reduce the loss on a learnable
    synthetic mapping, state.step advances, params stay sharded."""
    import jax
    import numpy as np

    from context_adaptive_neural_network_based_prediction_tpu.parallel import (
        mesh as mesh_mod, sharded_training)

    devices = jax.devices()
    if len(devices) < 4:
        import pytest
        pytest.skip("needs 4 virtual devices")
    mesh = mesh_mod.make_mesh({"data": 2, "model": 2}, devices[:4])
    w, bs, k = 4, 8, 10
    init_fn, chunk_fn = sharded_training.make_sharded_train_chunk(
        mesh, w, True, mean_training=128.0)
    state = init_fn(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)

    def make_chunk():
        # Learnable content: smooth gradients, target = continuation.
        above = np.zeros((k, bs, w, 3 * w, 1), np.uint8)
        left = np.zeros((k, bs, 2 * w, w, 1), np.uint8)
        tgt = np.zeros((k, bs, w, w, 1), np.uint8)
        for i in range(k):
            for b in range(bs):
                base = rng.uniform(50, 200)
                gx, gy = rng.normal(0, 3, 2)
                yy, xx = np.mgrid[0:2 * w, 0:3 * w]
                patch = np.clip(base + gx * xx + gy * yy, 0, 255)
                above[i, b, :, :, 0] = patch[:w, :]
                left[i, b, :, :, 0] = patch[:, :w]
                tyy, txx = np.mgrid[w:2 * w, w:2 * w]
                tgt[i, b, :, :, 0] = np.clip(base + gx * txx + gy * tyy,
                                             0, 255)
        return above, left, tgt

    a, l, t = make_chunk()
    state, losses0 = chunk_fn(state, jax.random.PRNGKey(1), a, l, t)
    first = float(losses0[0])
    for i in range(4):
        a, l, t = make_chunk()
        state, losses = chunk_fn(state, jax.random.PRNGKey(2 + i), a, l, t)
    last = float(losses[-1])
    assert int(jax.device_get(state.step)) == 5 * k
    assert np.isfinite(first) and np.isfinite(last)
    assert last < first, (first, last)
