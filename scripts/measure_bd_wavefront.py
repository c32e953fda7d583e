"""BD-rate of the TPU wavefront encoders' HM-conformant streams vs
HM-16.15 (NAL-exact).

The wavefront paths trade RD for massive throughput (whole-frame XLA
program); this publishes the quality cost of that trade next to the speed:
v1 = fixed 16x16 grid, v2 = CTB-32 with an on-device quadtree 32->16->8.

Usage: measure_bd_wavefront.py [parkscene|rgb_library] [v1|v2]
"""

import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

from context_adaptive_neural_network_based_prediction_tpu.codec import (
    hm_decoder)
from context_adaptive_neural_network_based_prediction_tpu.evaluation import (
    hm_driver)
from context_adaptive_neural_network_based_prediction_tpu.parallel import (
    wavefront, wavefront2)
from context_adaptive_neural_network_based_prediction_tpu.utils import metrics
from scripts.forced_structure_probe import hm_encode

QPS = [22, 27, 32, 37, 42]


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "parkscene"
    ver = sys.argv[2] if len(sys.argv) > 2 else "v2"
    if which == "parkscene":
        # 416x224: multiple of 32 for the v2 CTB grid.
        frame = hm_driver.load_luminance(
            "/root/reference/hevc/visualization/map_intra_prediction_modes/"
            "readme/luminance_parkscene.png")[400:624, 600:1016]
    else:
        frame = hm_driver.load_luminance(
            "/root/reference/hevc/pseudo_data/rgb_library.jpg")[:384, :384]
    h, w = frame.shape
    ours, hm = [], []
    for qp in QPS:
        if ver == "v2":
            stream, res = wavefront2.encode_frame_wavefront2_hm(frame, qp)
        else:
            stream, res = wavefront.encode_frame_wavefront_hm(frame, qp)
        hd = hm_decoder.decode_hm_stream(stream)
        assert hd.hash_checked and hd.hash_ok
        ours.append((len(stream) * 8 / (h * w),
                     float(metrics.compute_psnr(frame, hd.reconstruction))))
        hm_stream, hm_rec = hm_encode(frame, qp)
        hm.append((len(hm_stream) * 8 / (h * w),
                   float(metrics.compute_psnr(frame, hm_rec))))
        print(f"QP{qp}: wavefront {ours[-1][0]:.5f} bpp {ours[-1][1]:.3f} dB"
              f" | HM {hm[-1][0]:.5f} bpp {hm[-1][1]:.3f} dB", flush=True)

    def bd(lo, hi):
        return metrics.compute_bjontegaard(
            np.array([p[0] for p in hm[lo:hi]]),
            np.array([p[1] for p in hm[lo:hi]]),
            np.array([p[0] for p in ours[lo:hi]]),
            np.array([p[1] for p in ours[lo:hi]]))

    out = {"low": bd(0, 3), "high": bd(2, 5), "full": bd(0, 5),
           "wavefront": ours, "hm": hm, "qps": QPS, "frame": which,
           "version": ver}
    print(json.dumps({k: out[k] for k in ("low", "high", "full")}, indent=1))
    with open(f"artifacts/bd_wavefront_{ver}_{which}.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
