"""Same-crop frontier comparison: ctb32 vs ctb64 vs no-NxN wavefront2.

Writes artifacts/frontier_points.json incrementally: BD vs HM on the SAME
384x192 ParkScene crop for {ctb32, ctb64, ctb32-noNxN}, so the structure
knobs are comparable (the per-version BD artifacts use different crops).
"""
import json, sys
sys.path.insert(0, "/root/repo")
import os
import jax
jax.config.update("jax_platforms", os.environ.get("CANP_BD_PLATFORM", "cpu"))
import numpy as np
from context_adaptive_neural_network_based_prediction_tpu.codec import hm_decoder
from context_adaptive_neural_network_based_prediction_tpu.evaluation import hm_driver
from context_adaptive_neural_network_based_prediction_tpu.parallel import wavefront2
from context_adaptive_neural_network_based_prediction_tpu.utils import metrics
from scripts.forced_structure_probe import hm_encode

QPS = [22, 27, 32, 37, 42]

def main():
    frame = hm_driver.load_luminance(
        "/root/reference/hevc/visualization/map_intra_prediction_modes/"
        "readme/luminance_parkscene.png")[400:592, 600:984]   # 192x384
    h, w = frame.shape
    out = {"frame": "parkscene_192x384", "qps": QPS}
    path = "artifacts/frontier_points.json"
    hm = []
    for qp in QPS:
        s, rec = hm_encode(frame, qp)
        hm.append((len(s) * 8 / (h * w), float(metrics.compute_psnr(frame, rec))))
    out["hm"] = hm

    def bd(ref, test, lo, hi):
        return metrics.compute_bjontegaard(
            np.array([p[0] for p in ref[lo:hi]]), np.array([p[1] for p in ref[lo:hi]]),
            np.array([p[0] for p in test[lo:hi]]), np.array([p[1] for p in test[lo:hi]]))

    for name, kw in (("ctb32", {}), ("ctb64", {"ctb": 64}),
                     ("ctb32_nonxn", {"enable_nxn": False})):
        pts = []
        for qp in QPS:
            stream, res = wavefront2.encode_frame_wavefront2_hm(frame, qp, **kw)
            hd = hm_decoder.decode_hm_stream(stream)
            assert hd.hash_ok and np.array_equal(hd.reconstruction, res.reconstruction)
            pts.append((len(stream) * 8 / (h * w),
                        float(metrics.compute_psnr(frame, hd.reconstruction))))
            print(name, qp, pts[-1], flush=True)
        out[name] = {"points": pts,
                     "bd_vs_hm": {"low": bd(hm, pts, 0, 3),
                                  "high": bd(hm, pts, 2, 5),
                                  "full": bd(hm, pts, 0, 5)}}
        print(name, out[name]["bd_vs_hm"], flush=True)
        json.dump(out, open(path, "w"), indent=1)

if __name__ == "__main__":
    main()
