"""Dump one RDOQ mismatch vs HM in coefficient detail (extends the parity
probe): input residual/coeffs and the level diffs by scan position."""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

from context_adaptive_neural_network_based_prediction_tpu.codec import (
    hm_decoder, rdo, rdoq, scans, syntax)
from context_adaptive_neural_network_based_prediction_tpu.codec.contexts import (
    OFFSETS, make_context_states)
from context_adaptive_neural_network_based_prediction_tpu.ops import (
    intra, reference_samples as rs, transform)

GOLDEN = "/root/repo/tests/golden_hm/128_full_q32"
TARGETS = [(56, 24, 8), (112, 32, 8), (120, 48, 8)]


def main():
    src = np.load(GOLDEN + "_src.npy").astype(np.int32)
    stream = open(GOLDEN + ".bin", "rb").read()

    d = hm_decoder.HmFrameDecoder(stream)
    from context_adaptive_neural_network_based_prediction_tpu.codec import native
    res = native.hm_decode_slice_native(
        d.sh.slice_data, width=d.w, height=d.h, ctu_size=d.ctu,
        log2_min_cb=d.sps.log2_min_cb, log2_max_tb=d.sps.log2_max_tb,
        log2_min_tb=d.sps.log2_min_tb,
        max_tr_depth_intra=d.sps.max_transform_hierarchy_depth_intra,
        chroma=d.chroma, qp=d.qp, qp_cb=0, qp_cr=0,
        transform_skip_enabled=d.pps.transform_skip_enabled,
        sign_data_hiding=d.pps.sign_data_hiding,
        sao_luma=d.sh.sao_luma, sao_chroma=d.sh.sao_chroma,
        strong_intra_smoothing=d.sps.strong_intra_smoothing,
        policy=0, reconstruct=False)

    qp = d.qp
    lam = rdo.lambda_for_qp(qp)
    h, w = d.h, d.w
    recon = np.zeros((h, w), dtype=np.int32)
    unit_coded = np.zeros((h // 4, w // 4), dtype=bool)
    est_ctx = make_context_states(qp)
    counter = rdo.BitCounter()

    for rec_meta in res["tu_meta"]:
        plane, x, y, n, mode, cbf, tskip, off = (int(v) for v in rec_meta)
        if plane != 0:
            continue
        flags = rs.neighbor_unit_flags(unit_coded, x, y, n, h, w)
        ref_top, ref_left = rs.fill_reference_samples(recon, x, y, n, flags)
        if rs.use_filtered_for_mode(mode, n):
            ref_top, ref_left = rs.filter_reference_samples(
                ref_top, ref_left, n,
                strong_intra_smoothing=d.sps.strong_intra_smoothing)
        pred = intra.predict_one_mode_np(ref_top, ref_left, mode)
        resi = src[y:y + n, x:x + n] - pred
        q_hm = (res["coeffs"][off:off + n * n].reshape(n, n) if cbf
                else np.zeros((n, n), dtype=np.int32))
        if not tskip and (x, y, n) in TARGETS:
            coeff = transform.forward_transform_np(resi[None],
                                                   use_dst=(n == 4))[0]
            q_py = rdoq.rdoq_python(coeff, qp, mode, lam, est_ctx.copy(),
                                    cbf_ctx_offset=0,
                                    sign_hiding=d.pps.sign_data_hiding)
            q_nat = rdoq.rdoq(coeff, qp, mode, lam, est_ctx.copy(),
                              cbf_ctx_offset=0,
                              sign_hiding=d.pps.sign_data_hiding)
            print(f"\n=== TU ({x},{y}) n={n} mode={mode} ===")
            print("coeff:\n", coeff)
            print("ours(py):\n", q_py)
            print("ours(native):\n", q_nat)
            print("HM:\n", q_hm)
            print("py==native:", np.array_equal(q_py, q_nat))
            q_nosdh = rdoq.rdoq_python(coeff, qp, mode, lam, est_ctx.copy(),
                                       cbf_ctx_offset=0, sign_hiding=False)
            print("ours pre-SDH:\n", q_nosdh)
            print("diff(ours_sdh - ours_presdh) nonzero:",
                  list(zip(*np.nonzero(q_py - q_nosdh))))
            print("diff(hm - ours_presdh) nonzero:",
                  list(zip(*np.nonzero(q_hm - q_nosdh))))
            scan_type = syntax._scan_for(mode, n, syntax.LUMA)
            scan = scans.scan_order(n, n, scan_type)
            dif = [(int(sp), int(q_py.reshape(-1)[scan[sp]]),
                    int(q_hm.reshape(-1)[scan[sp]]))
                   for sp in range(n * n)
                   if q_py.reshape(-1)[scan[sp]] != q_hm.reshape(-1)[scan[sp]]]
            print("scanpos diffs (pos, ours, hm):", dif)
        # continue along HM path
        if cbf:
            deq = transform.dequantize_np(q_hm[None], qp)[0]
            if tskip:
                tshift = transform.transform_shift(2)
                rr = (deq + (1 << (tshift - 1))) >> tshift
            else:
                rr = transform.inverse_transform_np(deq[None],
                                                    use_dst=(n == 4))[0]
            blk = np.clip(pred + rr, 0, 255)
        else:
            blk = pred
        recon[y:y + n, x:x + n] = blk
        unit_coded[y // 4:(y + n) // 4, x // 4:(x + n) // 4] = True
        counter.encode_bin(cbf, est_ctx, OFFSETS.cbf_luma)
        if cbf:
            if d.pps.transform_skip_enabled and n == 4:
                counter.encode_bin(tskip, est_ctx, OFFSETS.transform_skip)
            syntax.encode_coefficients(counter, est_ctx, q_hm, mode,
                                       d.pps.sign_data_hiding)


if __name__ == "__main__":
    main()
