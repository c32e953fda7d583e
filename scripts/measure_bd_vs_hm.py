"""BD-rate of our encoder vs HM-16.15, NAL-exact accounting.

Both encoders emit standard Annex-B HEVC (ours via codec.hm_encoder), so the
rates include identical container overhead; both reconstructions are the
normative HEVC decodes.  Reference 5-QP protocol.

Usage: measure_bd_vs_hm.py [rgb_library|parkscene]
  rgb_library: 384x384 luma crop of the reference test photo (default);
  parkscene:   416x240 luma crop of the ParkScene video frame (the
               D_BasketballPass-class anchor named in BASELINE.json).
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

from context_adaptive_neural_network_based_prediction_tpu.evaluation import (
    hm_driver, performance)
from context_adaptive_neural_network_based_prediction_tpu.utils import (
    metrics, yuv)

from context_adaptive_neural_network_based_prediction_tpu.evaluation import hm_driver as _hd

ENC = _hd.hm_binary("TAppEncoderStatic")
CFG = "/root/reference/hevc/configuration/intra_main_rext.cfg"
QPS = [22, 27, 32, 37, 42]


def hm_points(frame):
    h, w = frame.shape
    points = []
    for qp in QPS:
        with tempfile.TemporaryDirectory() as tmp:
            yi = os.path.join(tmp, "in.yuv")
            bo = os.path.join(tmp, "out.bin")
            ro = os.path.join(tmp, "rec.yuv")
            yuv.write_400_or_420(frame[:, :, None, None], yi)
            subprocess.run(
                [ENC, "-c", CFG, "-i", yi, "-b", bo, "-o", ro,
                 "-wdt", str(w), "-hgt", str(h), "--InputBitDepth=8",
                 "--InputChromaFormat=400", "--FramesToBeEncoded=1",
                 f"--QP={qp}"], capture_output=True, check=True)
            bits = os.path.getsize(bo) * 8
            rec = yuv.read_400_or_420(h, w, 1, np.uint8, True, ro)[:, :, 0, 0]
            points.append((bits / (h * w),
                           float(metrics.compute_psnr(frame, rec))))
            print(f"HM QP{qp}: {points[-1][0]:.5f} bpp {points[-1][1]:.3f} dB",
                  flush=True)
    return points


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "rgb_library"
    if which == "parkscene":
        frame = hm_driver.load_luminance(
            "/root/reference/hevc/visualization/map_intra_prediction_modes/"
            "readme/luminance_parkscene.png")[400:640, 600:1016]
        out_path = "artifacts/bd_vs_hm_parkscene_416x240.json"
    else:
        frame = hm_driver.load_luminance(
            "/root/reference/hevc/pseudo_data/rgb_library.jpg")[:384, :384]
        out_path = "artifacts/bd_vs_hm_nal_exact.json"
    ours = []
    for qp in QPS:
        pt = performance.compute_rate_psnr(frame, qp, use_hm_container=True)
        ours.append((pt.rate_bpp, pt.psnr_db))
        print(f"ours QP{qp}: {pt.rate_bpp:.5f} bpp {pt.psnr_db:.3f} dB "
              f"({pt.encode_time_s:.0f}s)", flush=True)
    hm = hm_points(frame)

    def bd(lo, hi):
        return metrics.compute_bjontegaard(
            np.array([p[0] for p in hm[lo:hi]]),
            np.array([p[1] for p in hm[lo:hi]]),
            np.array([p[0] for p in ours[lo:hi]]),
            np.array([p[1] for p in ours[lo:hi]]))

    mid = len(QPS) // 2
    out = {"low": bd(0, mid + 1), "high": bd(mid, len(QPS)),
           "full": bd(0, len(QPS)),
           "ours": ours, "hm": hm, "qps": QPS}
    print(json.dumps({k: v for k, v in out.items() if k in
                      ("low", "high", "full")}, indent=1))
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
