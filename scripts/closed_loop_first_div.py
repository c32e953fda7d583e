"""Find the first TU where the closed-loop full-forced encode diverges from
HM's stream levels, and report how many TUs diverge in total.

Usage: closed_loop_first_div.py [qp]
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

from context_adaptive_neural_network_based_prediction_tpu.codec import (
    encoder, hm_decoder, native, rdo)
from context_adaptive_neural_network_based_prediction_tpu.evaluation import \
    hm_driver
from scripts.forced_structure_probe import (ForcedEncoder, hm_encode,
                                            record_tree)

QP = int(sys.argv[1]) if len(sys.argv) > 1 else 32


def main():
    frame = hm_driver.load_luminance(
        "/root/reference/hevc/pseudo_data/rgb_library.jpg")[:384, :384]
    hm_stream, _ = hm_encode(frame, QP)
    rec = record_tree(hm_stream)

    d2 = hm_decoder.HmFrameDecoder(hm_stream)
    nres = native.hm_decode_slice_native(
        d2.sh.slice_data, width=d2.w, height=d2.h, ctu_size=d2.ctu,
        log2_min_cb=d2.sps.log2_min_cb, log2_max_tb=d2.sps.log2_max_tb,
        log2_min_tb=d2.sps.log2_min_tb,
        max_tr_depth_intra=d2.sps.max_transform_hierarchy_depth_intra,
        chroma=d2.chroma, qp=d2.qp, qp_cb=0, qp_cr=0,
        transform_skip_enabled=d2.pps.transform_skip_enabled,
        sign_data_hiding=d2.pps.sign_data_hiding,
        sao_luma=d2.sh.sao_luma, sao_chroma=d2.sh.sao_chroma,
        strong_intra_smoothing=d2.sps.strong_intra_smoothing,
        policy=0, reconstruct=False)
    hm_levels = {}
    for meta in nres["tu_meta"]:
        plane, x, y, n, mode, cbf, tskip, off = (int(v) for v in meta)
        if plane:
            continue
        q = (nres["coeffs"][off:off + n * n].reshape(n, n).astype(np.int32)
             if cbf else np.zeros((n, n), np.int32))
        hm_levels[(x, y, n)] = (q, tskip)

    trace = []

    class Tracing(ForcedEncoder):
        def _code_tu(self, x, y, n, mode, counter_ctx, counter, *, tu_depth0,
                     pred=None, allow_tskip=True):
            s, turec = super()._code_tu(x, y, n, mode, counter_ctx, counter,
                                        tu_depth0=tu_depth0, pred=pred,
                                        allow_tskip=allow_tskip)
            trace.append((x, y, n, turec))
            return s, turec

    fe = Tracing(frame, QP, max_tu_depth=3)
    fe.attach(rec, force_tu=True)
    fe.encode()

    n_same = n_diff = 0
    first = None
    for (x, y, n, turec) in trace:
        q_hm, ts_hm = hm_levels[(x, y, n)]
        q_ours = (turec.coeffs if turec.cbf else np.zeros((n, n), np.int32))
        if np.array_equal(q_ours, q_hm) and turec.tskip == ts_hm:
            n_same += 1
        else:
            n_diff += 1
            if first is None:
                first = (x, y, n, q_ours, q_hm, turec.tskip, ts_hm)
    print(f"QP{QP} closed-loop full-forced: {n_same} TUs match HM, "
          f"{n_diff} differ ({100*n_diff/(n_same+n_diff):.1f}%)")
    if first:
        x, y, n, qo, qh, tso, tsh = first
        print(f"first divergence at ({x},{y}) n={n} tskip {tso} vs {tsh}")
        print("ours:\n", qo)
        print("HM:\n", qh)


if __name__ == "__main__":
    main()
