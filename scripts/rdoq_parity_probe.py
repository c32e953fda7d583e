"""RDOQ parity probe: would our RDOQ pick HM's exact coefficient levels?

Replays the HM golden stream TU by TU (native parse gives HM's geometry,
modes and levels).  At each luma TU, predicts from the HM-path recon state,
forms the encoder residual against the source, transforms it, and runs OUR
rdoq() with context states evolved along HM's own coded syntax.  Reports how
often our quantizer reproduces HM's levels and how the level sums compare —
isolating quantizer calibration from mode/structure decisions.
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

from context_adaptive_neural_network_based_prediction_tpu.codec import (
    hm_decoder, rdo, rdoq, syntax)
from context_adaptive_neural_network_based_prediction_tpu.codec.contexts import (
    OFFSETS, make_context_states)
from context_adaptive_neural_network_based_prediction_tpu.ops import (
    intra, reference_samples as rs, transform)

GOLDEN = "/root/repo/tests/golden_hm/128_full_q32"


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

    n_tu = n_match = 0
    abs_ours = abs_hm = 0
    nz_ours = nz_hm = 0
    mismatch_examples = []
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
        if not tskip:
            coeff = transform.forward_transform_np(resi[None],
                                                   use_dst=(n == 4))[0]
            q_ours = rdoq.rdoq(coeff, qp, mode, lam, est_ctx.copy(),
                               cbf_ctx_offset=0,
                               sign_hiding=d.pps.sign_data_hiding)
            n_tu += 1
            if np.array_equal(q_ours, q_hm):
                n_match += 1
            else:
                if len(mismatch_examples) < 8:
                    dif = int(np.abs(q_ours).sum() - np.abs(q_hm).sum())
                    mismatch_examples.append((x, y, n, mode, dif))
            abs_ours += int(np.abs(q_ours).sum())
            abs_hm += int(np.abs(q_hm).sum())
            nz_ours += int((q_ours != 0).sum())
            nz_hm += int((q_hm != 0).sum())

        # Continue along HM's committed path: recon from HM's levels, and
        # evolve contexts by re-encoding HM's actual TU syntax.
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

    print(f"luma TUs (non-tskip, cbf or not): {n_tu}")
    print(f"exact level match: {n_match} ({100*n_match/max(n_tu,1):.1f}%)")
    print(f"sum|level|: ours {abs_ours}  HM {abs_hm}")
    print(f"nonzero count: ours {nz_ours}  HM {nz_hm}")
    for ex in mismatch_examples:
        print("  mismatch x,y,n,mode,d|lvl|:", ex)


if __name__ == "__main__":
    main()
