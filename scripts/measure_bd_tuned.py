"""BD-rate vs HM-16.15, NAL-exact, with the tuned search config
(QuadtreeTUMaxDepthIntra=3 to match intra_main_rext.cfg + 8 full-RD
candidates for 16/32/64 PUs).

Reuses the HM-side RD points recorded in artifacts/bd_vs_hm_nal_exact.json
(HM is deterministic: same binary/cfg/input -> identical points, previously
measured on this machine)."""

import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

from context_adaptive_neural_network_based_prediction_tpu.evaluation import (
    hm_driver, performance)
from context_adaptive_neural_network_based_prediction_tpu.utils import metrics

QPS = [22, 27, 32, 37, 42]
TUNED = dict(max_tu_depth=3, rd_candidates={16: 8, 32: 8, 64: 8})


def main():
    prev = json.load(open("artifacts/bd_vs_hm_nal_exact.json"))
    hm = prev["hm"]
    assert prev["qps"] == QPS
    frame = hm_driver.load_luminance(
        "/root/reference/hevc/pseudo_data/rgb_library.jpg")[:384, :384]
    ours = []
    for qp in QPS:
        pt = performance.compute_rate_psnr(frame, qp, use_hm_container=True,
                                           **TUNED)
        ours.append((pt.rate_bpp, pt.psnr_db))
        print(f"ours(tuned) QP{qp}: {pt.rate_bpp:.5f} bpp {pt.psnr_db:.3f} dB "
              f"({pt.encode_time_s:.0f}s)", flush=True)

    def bd(lo, hi):
        return metrics.compute_bjontegaard(
            np.array([p[0] for p in hm[lo:hi]]),
            np.array([p[1] for p in hm[lo:hi]]),
            np.array([p[0] for p in ours[lo:hi]]),
            np.array([p[1] for p in ours[lo:hi]]))

    mid = len(QPS) // 2
    out = {"low": bd(0, mid + 1), "high": bd(mid, len(QPS)),
           "full": bd(0, len(QPS)), "ours": ours, "hm": hm, "qps": QPS,
           "config": {"max_tu_depth": 3, "rd_candidates": {16: 8, 32: 8, 64: 8}}}
    print(json.dumps({k: out[k] for k in ("low", "high", "full")}, indent=1))
    with open("artifacts/bd_vs_hm_nal_exact_tuned.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
