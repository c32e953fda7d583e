"""Real-lambda-cost frontier comparison: ours vs HM-16.15 per QP.

For each QP, measure (NAL bits, SSE of the normative reconstruction) for our
encoder (selectable config) and for the HM binary on the same frame, and
compare J = SSE + lambda(QP) * bits.  If our J <= HM's at every QP but BD-rate
is worse, the gap is operating-point placement (QP->lambda mapping), not
search quality; if our J is higher, the search/estimator is leaving real
gains and the per-QP J gap localizes it.
"""

import json
import os
import subprocess
import sys
import tempfile

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

from context_adaptive_neural_network_based_prediction_tpu.codec import rdo
from context_adaptive_neural_network_based_prediction_tpu.evaluation import (
    hm_driver, performance)
from context_adaptive_neural_network_based_prediction_tpu.utils import yuv

QPS = [22, 27, 32, 37, 42]


def hm_point(frame, qp):
    enc = hm_driver.hm_binary("TAppEncoderStatic")
    cfg = "/root/reference/hevc/configuration/intra_main_rext.cfg"
    h, w = frame.shape
    with tempfile.TemporaryDirectory() as tmp:
        yi = os.path.join(tmp, "in.yuv")
        bo = os.path.join(tmp, "out.bin")
        ro = os.path.join(tmp, "rec.yuv")
        yuv.write_400_or_420(frame[:, :, None, None], yi)
        subprocess.run(
            [enc, "-c", cfg, "-i", yi, "-b", bo, "-o", ro,
             "-wdt", str(w), "-hgt", str(h), "--InputBitDepth=8",
             "--InputChromaFormat=400", "--FramesToBeEncoded=1",
             f"--QP={qp}"], capture_output=True, check=True)
        bits = os.path.getsize(bo) * 8
        rec = yuv.read_400_or_420(h, w, 1, np.uint8, True, ro)[:, :, 0, 0]
    sse = float(((frame.astype(np.int64) - rec.astype(np.int64)) ** 2).sum())
    return bits, sse


def main():
    kwargs = {}
    label = "default"
    if len(sys.argv) > 1:
        label = sys.argv[1]
        if label == "cand8":
            kwargs = dict(rd_candidates={16: 8, 32: 8, 64: 8})
        elif label == "tuned":
            kwargs = dict(max_tu_depth=3, rd_candidates={16: 8, 32: 8, 64: 8})
        elif label == "depth3":
            kwargs = dict(max_tu_depth=3)

    frame = hm_driver.load_luminance(
        "/root/reference/hevc/pseudo_data/rgb_library.jpg")[:384, :384]
    rows = []
    for qp in QPS:
        lam = rdo.lambda_for_qp(qp)
        pt = performance.compute_rate_psnr(frame, qp, use_hm_container=True,
                                           **kwargs)
        npx = frame.size
        our_bits = pt.rate_bpp * npx
        mse = 255.0 ** 2 / (10 ** (pt.psnr_db / 10)) - 1e-6
        our_sse = mse * npx
        hm_bits, hm_sse = hm_point(frame, qp)
        j_ours = our_sse + lam * our_bits
        j_hm = hm_sse + lam * hm_bits
        rows.append(dict(qp=qp, our_bits=our_bits, our_sse=our_sse,
                         hm_bits=hm_bits, hm_sse=hm_sse,
                         j_ours=j_ours, j_hm=j_hm,
                         j_ratio=j_ours / j_hm))
        print(f"QP{qp}: ours bits={our_bits:8.0f} sse={our_sse:10.0f} "
              f"J={j_ours:12.0f} | HM bits={hm_bits:8.0f} sse={hm_sse:10.0f} "
              f"J={j_hm:12.0f} | J ratio {j_ours/j_hm:.4f}", flush=True)
    out = f"artifacts/real_cost_cmp_{label}.json"
    with open(out, "w") as f:
        json.dump(rows, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
