"""Exactness tests for the fused unit-trial kernel (ops/unit_fused.py).

The fused (n^2, M*B)-layout formulation must reproduce the wavefront2
closure math BIT-identically (costs, modes, reconstructions, levels): the
trial's decisions feed a normative CABAC serializer, so any divergence
changes decoded pixels.  The reference here is a 1:1 transcription of the
wavefront2 trial (filter_refs / predict35 / fwd_t / quantize_rd / inv_t /
cost+argmin, `parallel/wavefront2.py`); end-to-end byte-identity of full
streams is separately asserted by scripts/w2_golden.py and
test_wavefront_nn.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from context_adaptive_neural_network_based_prediction_tpu.ops import (
    intra, transform, unit_fused)
from context_adaptive_neural_network_based_prediction_tpu.ops import (
    reference_samples as rs)
from context_adaptive_neural_network_based_prediction_tpu.codec import rdo
from context_adaptive_neural_network_based_prediction_tpu.parallel import (
    rate_model)

MB = 256.0
DS = 4.0


def make_size_consts(n, qp, n_modes):
    """The per-size constant bundle, as _build_wavefront2 constructs it."""
    per, rem = qp // 6, qp % 6
    g0, g1, frac, _ = intra._angular_tables(n)
    use_filt = np.array(
        [False if m == 1 else
         min(abs(m - 10), abs(m - 26)) > rs.FILTER_THRESHOLD[n]
         for m in range(35)])
    log2n = n.bit_length() - 1
    tshift = 15 - 8 - log2n
    sig0, sig1 = rate_model.sig_bits_tables(qp, n)
    lastx, lasty = rate_model.last_bits_tables(qp, n)
    sgather, mode_scan = rate_model.scan_tables(n)
    if n_modes == 36:
        mode_scan = np.concatenate([mode_scan, mode_scan[:1]])
    inv_gather = np.empty_like(sgather)
    for st in range(3):
        inv_gather[st, sgather[st]] = np.arange(n * n, dtype=np.int32)
    return dict(
        g0=g0, g1=g1, frac=frac, use_filt=use_filt,
        t_fwd=np.asarray(transform.DST4_FWD if n == 4
                         else transform.dct_matrix(n, True), np.int32),
        t_inv=np.asarray(transform.DST4 if n == 4
                         else transform.dct_matrix(n), np.int32),
        shift1=log2n + 8 + transform.FWD_MATRIX_SHIFT - 15,
        shift2=log2n + transform.FWD_MATRIX_SHIFT,
        qbits=14 + per + tshift,
        iq_shift=6 - (tshift + per),
        err_scale=float(2.0 ** (-2.0 * tshift)
                        / float(transform.QUANT_SCALES[rem]) ** 2),
        sig0=sig0[mode_scan], sig1=sig1[mode_scan],
        lastx=lastx, lasty=lasty,
        sg=sgather[mode_scan], inv_sg=inv_gather[mode_scan],
    )


def ref_trial(c, SB, lam, qscale, iq_scale, n, n_modes,
              ref_top, ref_left, orig, mode_bits, nn_pred, policy):
    """Transcription of the wavefront2 closure trial (slot-major layout)."""
    SBI = {k: jnp.int32(round(v * MB)) for k, v in SB.items()}

    def filter_refs(ref_top, ref_left):
        corner = ref_top[0]
        top = ref_top[1:]
        left = ref_left[1:]
        ext_t = jnp.concatenate([left[:1], ref_top])
        f_top_vals = (ext_t[:-2] + 2 * ext_t[1:-1] + ext_t[2:] + 2) >> 2
        f_top = jnp.concatenate([f_top_vals[:2 * n], top[2 * n - 1:]])
        ext_l = jnp.concatenate([top[:1],
                                 jnp.concatenate([corner[None], left])])
        f_left_vals = (ext_l[:-2] + 2 * ext_l[1:-1] + ext_l[2:] + 2) >> 2
        f_left = jnp.concatenate([f_top[:1], f_left_vals[1:2 * n],
                                  left[2 * n - 1:]])
        if n == 32:
            thr = 1 << 3
            bl = left[2 * n - 1]
            tr = top[2 * n - 1]
            cond = jnp.logical_and(
                jnp.abs(bl + corner - 2 * left[n - 1]) < thr,
                jnp.abs(corner + tr - 2 * top[n - 1]) < thr)
            i = jnp.arange(1, 2 * n)
            s_top = jnp.concatenate([
                corner[None],
                ((2 * n - i) * corner + i * tr + n) >> 6,
                tr[None]])
            s_left = jnp.concatenate([
                corner[None],
                ((2 * n - i) * corner + i * bl + n) >> 6,
                bl[None]])
            f_top = jnp.where(cond, s_top, f_top)
            f_left = jnp.where(cond, s_left, f_left)
        return f_top, f_left

    def predict35(ref_top, ref_left):
        comb = jnp.concatenate([ref_top, ref_left])
        ang = (((32 - jnp.asarray(c["frac"])) * comb[jnp.asarray(c["g0"])]
                + jnp.asarray(c["frac"]) * comb[jnp.asarray(c["g1"])] + 16)
               >> 5)
        if n <= 16:
            col_adj = (ref_left[1:n + 1] - ref_left[0]) >> 1
            ang = ang.at[26 - 2, :, 0].set(
                jnp.clip(ang[26 - 2, :, 0] + col_adj, 0, 255))
            row_adj = (ref_top[1:n + 1] - ref_top[0]) >> 1
            ang = ang.at[10 - 2, 0, :].set(
                jnp.clip(ang[10 - 2, 0, :] + row_adj, 0, 255))
        top_w = ref_top[1:n + 1]
        left_w = ref_left[1:n + 1]
        dc = (jnp.sum(top_w) + jnp.sum(left_w) + n) // (2 * n)
        dc_blk = jnp.full((n, n), dc, jnp.int32)
        if n <= 16:
            dc_blk = dc_blk.at[0, :].set((top_w + 3 * dc + 2) >> 2)
            dc_blk = dc_blk.at[1:, 0].set((left_w[1:] + 3 * dc + 2) >> 2)
            dc_blk = dc_blk.at[0, 0].set(
                (top_w[0] + left_w[0] + 2 * dc + 2) >> 2)
        s = n.bit_length() - 1
        T = top_w[None, :]
        L = left_w[:, None]
        TR = ref_top[n + 1]
        BL = ref_left[n + 1]
        xs = jnp.arange(n)[None, :]
        ys = jnp.arange(n)[:, None]
        planar = (((L << s) + n + (xs + 1) * (TR - L))
                  + ((T << s) + (ys + 1) * (BL - T))) >> (s + 1)
        return jnp.concatenate([planar[None], dc_blk[None], ang], axis=0)

    def fwd_t(resi):
        t = jnp.asarray(c["t_fwd"])
        add1 = 1 << (c["shift1"] - 1)
        add2 = 1 << (c["shift2"] - 1)
        a = (jnp.einsum("min,kn->mik", resi, t) + add1) >> c["shift1"]
        hi, lo = a >> 8, a & 255
        hs = jnp.einsum("ki,mil->mkl", t, hi)
        ls = jnp.einsum("ki,mil->mkl", t, lo)
        return (hs + ((ls + add2) >> 8)) >> (c["shift2"] - 8)

    def inv_t(coeff):
        t = jnp.asarray(c["t_inv"])
        e = jnp.clip((jnp.einsum("ki,mkl->mil", t, coeff) + 64) >> 7,
                     -32768, 32767)
        return jnp.clip((jnp.einsum("mik,kn->min", e, t) + (1 << 11)) >> 12,
                        -32768, 32767)

    def level_mbits(lvl):
        s = lvl - 3
        m = jnp.maximum(s - 2, 1)
        g = jnp.zeros_like(lvl)
        for j in range(1, 16):
            g = g + jnp.where(m >= (1 << j), 1, 0)
        golomb = jnp.where(s < 3, s + 1, 4 + 2 * g)
        return jnp.int32(round(MB)) + jnp.where(
            lvl == 1, SBI["g1_0"],
            jnp.where(lvl == 2, SBI["g1_1"] + SBI["g2_0"],
                      SBI["g1_1"] + SBI["g2_1"]
                      + golomb * jnp.int32(round(MB))))

    def level_bits(lvl):
        return level_mbits(lvl.astype(jnp.int32)).astype(jnp.float32) \
            * (1.0 / MB)

    qstep = float(2.0 ** c["qbits"])

    def quantize_rd(coeff):
        N = n * n
        sg = jnp.asarray(c["sg"])
        inv_sg = jnp.asarray(c["inv_sg"])
        sig0 = jnp.asarray(c["sig0"])
        sig1 = jnp.asarray(c["sig1"])
        flat = coeff.reshape(n_modes, N)
        cs = jnp.take_along_axis(flat, sg, axis=1)
        sign = jnp.sign(cs)
        ldf = jnp.abs(cs).astype(jnp.float32) * float(qscale)
        ma = jnp.minimum(jnp.floor(ldf / qstep + 0.5), 32767.0)
        lo = jnp.maximum(ma - 1.0, 1.0)

        def coded_cost(lvl):
            err = ldf - lvl * qstep
            return (err * err * c["err_scale"]
                    + lam * (sig1 + level_bits(lvl)))

        d0 = ldf * ldf * c["err_scale"]
        cost0 = d0 + lam * sig0
        cost_hi = coded_cost(ma)
        cost_lo = coded_cost(lo)
        pick_lo = cost_lo < cost_hi
        lvl_nz = jnp.where(pick_lo, lo, ma)
        cost_nz = jnp.where(pick_lo, cost_lo, cost_hi)
        nz = jnp.logical_and(ma > 0, cost_nz < cost0)
        lvl = jnp.where(nz, lvl_nz, 0.0).astype(jnp.int32)

        sig0_i = jnp.round(sig0 * MB).astype(jnp.int32)
        sig1_i = jnp.round(sig1 * MB).astype(jnp.int32)
        i = jnp.arange(N)
        last = jnp.max(jnp.where(lvl > 0, i[None], -1), axis=1)
        cbf = last >= 0
        sig_paid = i[None] < last[:, None]
        ncg = max(N // 16, 1)
        if ncg > 1:
            cgnz = jnp.any((lvl > 0).reshape(n_modes, ncg, 16), axis=2)
            lastcg = last >> 4
            cgi = jnp.arange(ncg)
            csb_paid = jnp.logical_and(cgi[None] > 0,
                                       cgi[None] < lastcg[:, None])
            csb_mb = jnp.sum(
                jnp.where(csb_paid,
                          jnp.where(cgnz, SBI["csb1"], SBI["csb0"]), 0),
                axis=1)
            cg_coded = (cgi[None] == 0) | (cgi[None] == lastcg[:, None]) \
                | cgnz
            sig_paid = jnp.logical_and(
                sig_paid, jnp.repeat(cg_coded, 16, axis=1))
        else:
            csb_mb = jnp.zeros((n_modes,), jnp.int32)
        sig_mb = jnp.sum(
            jnp.where(sig_paid,
                      jnp.where(lvl > 0, sig1_i, sig0_i), 0), axis=1)
        lvl_mb = jnp.sum(jnp.where(lvl > 0, level_mbits(lvl), 0), axis=1)
        lastx_i = jnp.round(jnp.asarray(c["lastx"]) * MB).astype(jnp.int32)
        lasty_i = jnp.round(jnp.asarray(c["lasty"]) * MB).astype(jnp.int32)
        last_raster = jnp.take_along_axis(
            sg, jnp.maximum(last, 0)[:, None], axis=1)[:, 0]
        lb_mb = lastx_i[last_raster % n] + lasty_i[last_raster // n]
        mb_coded = SBI["cbf1"] + lb_mb + csb_mb + sig_mb + lvl_mb
        bits_coded = mb_coded.astype(jnp.float32) * (1.0 / MB)
        dc_el = jnp.where(lvl > 0,
                          (ldf - lvl.astype(jnp.float32) * qstep) ** 2
                          * c["err_scale"], d0)
        d_coded = jnp.sum(jnp.round(dc_el * DS).astype(jnp.int32),
                          axis=1).astype(jnp.float32) * (1.0 / DS)
        d_zero = jnp.sum(jnp.round(d0 * DS).astype(jnp.int32),
                         axis=1).astype(jnp.float32) * (1.0 / DS)
        zero_cost = d_zero + lam * SB["cbf0"]
        keep = jnp.logical_and(
            cbf, d_coded + lam * bits_coded < zero_cost)
        lvl = jnp.where(keep[:, None], lvl, 0)
        tu_bits = jnp.where(keep, bits_coded, SB["cbf0"])

        ncg16 = max(N // 16, 1)
        lvr = lvl.reshape(n_modes, ncg16, 16)
        sgr = sign.reshape(n_modes, ncg16, 16)
        ldr = ldf.reshape(n_modes, ncg16, 16)
        pos = jnp.arange(16)
        nzr = lvr > 0
        firstp = jnp.min(jnp.where(nzr, pos, 16), axis=2)
        lastp = jnp.max(jnp.where(nzr, pos, -1), axis=2)
        span_ok = (lastp - firstp) >= 4
        parity = jnp.sum(lvr, axis=2) & 1
        sfirst = jnp.take_along_axis(
            sgr, jnp.clip(firstp, 0, 15)[..., None], axis=2)[..., 0]
        want = (sfirst < 0).astype(jnp.int32)
        mismatch = jnp.logical_and(span_ok, parity != want)

        def dcost(new_lvl, old_lvl):
            dn = ((ldr - new_lvl.astype(jnp.float32) * qstep) ** 2
                  - (ldr - old_lvl.astype(jnp.float32) * qstep) ** 2)
            return (dn * c["err_scale"]
                    + lam * (level_bits(new_lvl) - level_bits(old_lvl)))

        big = jnp.float32(1e30)
        up = jnp.where(nzr, dcost(lvr + 1, lvr), big)
        dn = jnp.where(lvr >= 2, dcost(lvr - 1, lvr), big)
        best_adj = jnp.minimum(up, dn)
        pick = jnp.argmin(best_adj, axis=2)
        delta = jnp.where(
            jnp.take_along_axis(up, pick[..., None], 2)[..., 0]
            <= jnp.take_along_axis(dn, pick[..., None], 2)[..., 0],
            1, -1)
        onehot = (pos[None, None] == pick[..., None]).astype(jnp.int32)
        lvr = lvr + jnp.where(mismatch[..., None],
                              onehot * delta[..., None], 0)
        lvl = lvr.reshape(n_modes, N)
        tu_bits = tu_bits - jnp.sum(
            jnp.where(span_ok, 1, 0), axis=1).astype(jnp.float32)

        q_scan = sign * lvl
        q = jnp.take_along_axis(q_scan, inv_sg,
                                axis=1).reshape(n_modes, n, n)
        return q, tu_bits

    def one(rt, rl, og, mbits, nnp):
        f_top, f_left = filter_refs(rt, rl)
        preds_u = predict35(rt, rl)
        preds_f = predict35(f_top, f_left)
        uf = jnp.asarray(c["use_filt"])[:, None, None]
        preds = jnp.where(uf, preds_f, preds_u)
        if policy == "sub18":
            preds = preds.at[18].set(nnp)
        elif policy == "append":
            preds = jnp.concatenate([preds, nnp[None]], 0)
        elif n_modes == 36:
            preds = jnp.concatenate(
                [preds, jnp.zeros((1, n, n), jnp.int32)], 0)
        resi = og[None] - preds
        coeff = fwd_t(resi)
        q, tu_bits = quantize_rd(coeff)
        if c["iq_shift"] > 0:
            deq = (q * iq_scale + (1 << (c["iq_shift"] - 1))) \
                >> c["iq_shift"]
        else:
            deq = (q * iq_scale) << (-c["iq_shift"])
        deq = jnp.clip(deq, -32768, 32767)
        rec = jnp.clip(preds + inv_t(deq), 0, 255)
        sse = jnp.sum((rec - og[None]) ** 2, axis=(1, 2)) \
            .astype(jnp.float32)
        cost = sse + lam * (tu_bits + mbits)
        best = jnp.argmin(cost).astype(jnp.int32)
        return cost[best], best, rec[best], q[best]

    return jax.vmap(one)(ref_top, ref_left, orig, mode_bits, nn_pred)


def _rand_inputs(rng, n, n_modes, b):
    base = rng.integers(0, 256)
    rt = np.clip(base + rng.integers(-60, 60, (b, 2 * n + 1)), 0, 255)
    rl = np.clip(base + rng.integers(-60, 60, (b, 2 * n + 1)), 0, 255)
    rl[:, 0] = rt[:, 0]
    og = np.clip(base + rng.integers(-70, 70, (b, n, n)), 0, 255)
    mb = rng.uniform(1.0, 6.0, (b, n_modes)).astype(np.float32)
    nnp = np.clip(base + rng.integers(-50, 50, (b, n, n)), 0, 255)
    return (rt.astype(np.int32), rl.astype(np.int32), og.astype(np.int32),
            mb, nnp.astype(np.int32))


CASES = [
    (4, 35, None, 27), (4, 35, None, 37), (4, 36, "append", 32),
    (8, 35, None, 27), (8, 35, None, 42), (8, 36, "append", 37),
    (8, 35, "sub18", 32),
    (16, 35, None, 32), (16, 36, "append", 37), (16, 35, "sub18", 27),
    (32, 35, None, 32), (32, 36, "append", 37),
]


@pytest.mark.parametrize("n,n_modes,policy,qp", CASES)
def test_fused_matches_reference(n, n_modes, policy, qp):
    rng = np.random.default_rng(100 * n + qp)
    c = make_size_consts(n, qp, n_modes)
    SB = rate_model.scalar_bits(qp)
    lam = rdo.lambda_for_qp(qp)
    rem = qp % 6
    qscale = transform.QUANT_SCALES[rem]
    iq_scale = transform.INV_QUANT_SCALES[rem]
    nn_mode = policy if policy in ("sub18", "append") else None
    cst = unit_fused.build_consts(n, n_modes, c, SB, lam, qscale, iq_scale,
                                  b_eff=9, nn_policy=nn_mode,
                                  groups={16: 6, 32: 36}.get(n, 1))
    for trial in range(3):
        rt, rl, og, mb, nnp = _rand_inputs(rng, n, n_modes, 9)
        nn_arg = jnp.asarray(nnp) if nn_mode else None
        got = unit_fused.trial_apply(
            cst, jnp.asarray(rt), jnp.asarray(rl), jnp.asarray(og),
            jnp.asarray(mb), nn_arg, impl="xla")
        want = ref_trial(c, SB, lam, qscale, iq_scale, n, n_modes,
                         jnp.asarray(rt), jnp.asarray(rl), jnp.asarray(og),
                         jnp.asarray(mb), jnp.asarray(nnp),
                         policy or ("pad" if n_modes == 36 else "none"))
        np.testing.assert_array_equal(np.asarray(got[1]),
                                      np.asarray(want[1]),
                                      err_msg=f"best mode trial {trial}")
        np.testing.assert_array_equal(np.asarray(got[0]).view(np.int32),
                                      np.asarray(want[0]).view(np.int32),
                                      err_msg=f"cost bits trial {trial}")
        np.testing.assert_array_equal(np.asarray(got[2]),
                                      np.asarray(want[2]),
                                      err_msg=f"rec trial {trial}")
        np.testing.assert_array_equal(np.asarray(got[3]),
                                      np.asarray(want[3]),
                                      err_msg=f"q trial {trial}")


def test_pallas_interpret_matches_xla():
    n, n_modes, qp = 4, 35, 32
    rng = np.random.default_rng(7)
    c = make_size_consts(n, qp, n_modes)
    SB = rate_model.scalar_bits(qp)
    lam = rdo.lambda_for_qp(qp)
    qscale = transform.QUANT_SCALES[qp % 6]
    iq_scale = transform.INV_QUANT_SCALES[qp % 6]
    cst = unit_fused.build_consts(n, n_modes, c, SB, lam, qscale, iq_scale,
                                  b_eff=5)
    rt, rl, og, mb, _ = _rand_inputs(rng, n, n_modes, 5)
    a = unit_fused.trial_apply(cst, jnp.asarray(rt), jnp.asarray(rl),
                               jnp.asarray(og), jnp.asarray(mb), None,
                               impl="xla")
    b = unit_fused.trial_apply(cst, jnp.asarray(rt), jnp.asarray(rl),
                               jnp.asarray(og), jnp.asarray(mb), None,
                               impl="pallas")
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.parametrize("n", [4, 8, 16, 32])
def test_fused_extreme_residuals(n):
    """Worst-case transform magnitudes (flat 255 resi + alternating sign):
    exercises the f32-exactness boundary of the forward matmuls, which
    random inputs rarely reach (the 2^14-scaled HEVC fwd matrices overflow
    f32's 2^24 integer window unless hi/lo-split)."""
    qp, n_modes = 22, 35
    c = make_size_consts(n, qp, n_modes)
    SB = rate_model.scalar_bits(qp)
    lam = rdo.lambda_for_qp(qp)
    qscale = transform.QUANT_SCALES[qp % 6]
    iq_scale = transform.INV_QUANT_SCALES[qp % 6]
    cst = unit_fused.build_consts(n, n_modes, c, SB, lam, qscale, iq_scale,
                                  b_eff=4, nn_policy=None,
                                  groups={16: 6, 32: 36}.get(n, 1))
    rt = np.zeros((4, 2 * n + 1), np.int32)
    rl = np.zeros((4, 2 * n + 1), np.int32)
    og = np.zeros((4, n, n), np.int32)
    og[0] = 255                                   # flat max resi vs 0-refs
    yy, xx = np.mgrid[0:n, 0:n]
    og[1] = 255 * ((yy + xx) % 2)                 # checkerboard
    og[2] = 255 * (xx % 2)
    rt[3], rl[3], og[3] = 255, 255, 0
    mb = np.full((4, n_modes), 2.0, np.float32)
    got = unit_fused.trial_apply(cst, jnp.asarray(rt), jnp.asarray(rl),
                                 jnp.asarray(og), jnp.asarray(mb), None,
                                 impl="xla")
    want = ref_trial(c, SB, lam, qscale, iq_scale, n, n_modes,
                     jnp.asarray(rt), jnp.asarray(rl), jnp.asarray(og),
                     jnp.asarray(mb), jnp.asarray(og), "none")
    for i, name in ((1, "best"), (2, "rec"), (3, "q")):
        np.testing.assert_array_equal(np.asarray(got[i]),
                                      np.asarray(want[i]), err_msg=name)
