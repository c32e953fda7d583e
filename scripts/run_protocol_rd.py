"""Reference-protocol RD experiment (VERDICT r2 task 5; Tables IX-X shape).

Protocol parity with `comparing_rate_distortion.py:536-537`:
* first luma frame only;
* QPs [17, 19, 22, 24, 27, 32, 34, 37, 39, 42];
* BD-rate over low/high (split at the QP-list midpoint) and full ranges;
* policies {regular, substitution, switch} x {single, pair} where "pair"
  engages the artifact-trained models at QP >= 32
  (`TComPrediction.cpp:155-170`).

Frames (no egress in this environment, so the BASELINE.json sequence classes
are represented by the frames available locally):
* kimono416: 416x240 crop of the B_Kimono first-frame luma (the
  D_BasketballPass-class geometry on Kimono content);
* library256: rgb_library 256x256 (held out from local training).

The encoder is the RD-grade host codec (the -0.013%-vs-HM path); per-run
encode wall time is recorded, giving the host encoder's fps for the
frontier table.  Results cache per (frame, policy, pair, qp) under
artifacts/rd_protocol/.
"""

import json
import os
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

from context_adaptive_neural_network_based_prediction_tpu.codec import (
    decoder, encoder, nn_intra)
from context_adaptive_neural_network_based_prediction_tpu.evaluation import (
    hm_driver)
from context_adaptive_neural_network_based_prediction_tpu.utils import metrics
from scripts.measure_bd_wavefront import load_bundle

QPS = [17, 19, 22, 24, 27, 32, 34, 37, 39, 42]
CACHE = "artifacts/rd_protocol"

FRAMES = {
    "kimono416": lambda: hm_driver.load_luminance(
        "/root/reference/hevc/visualization/map_intra_prediction_modes/"
        "readme/luminance_kimono.png")[400:640, 700:1116],
    "library256": lambda: hm_driver.load_luminance(
        "/root/reference/hevc/pseudo_data/rgb_library.jpg")[:256, :256],
}


def single_only(bundle):
    return nn_intra.PnnBundle(bundle.params, bundle.is_fully_connected,
                              bundle.mean_training,
                              quantized=bundle.quantized)


def run_point(frame, qp, policy, bundle, tag):
    os.makedirs(CACHE, exist_ok=True)
    path = f"{CACHE}/{tag}_qp{qp}.json"
    if os.path.isfile(path):
        with open(path) as f:
            return json.load(f)
    pnn = nn_intra.PnnPredictor(bundle) if bundle is not None else None
    t0 = time.time()
    res = encoder.FrameEncoder(frame, qp=qp, policy=policy, pnn=pnn).encode()
    enc_s = time.time() - t0
    dec = decoder.decode_frame(
        res.bitstream,
        pnn=nn_intra.PnnPredictor(bundle) if bundle is not None else None)
    assert np.array_equal(res.reconstruction, dec.reconstruction)
    h, w = frame.shape
    pt = {"qp": qp, "bpp": res.num_bits / (h * w),
          "psnr": float(metrics.compute_psnr(frame, res.reconstruction)),
          "encode_s": enc_s}
    with open(path, "w") as f:
        json.dump(pt, f)
    print(f"  {tag} QP{qp}: {pt['bpp']:.5f} bpp {pt['psnr']:.3f} dB "
          f"({enc_s:.0f}s)", flush=True)
    return pt


def bd_lhf(ref, test):
    def bd(lo, hi):
        return metrics.compute_bjontegaard(
            np.array([p["bpp"] for p in ref[lo:hi]]),
            np.array([p["psnr"] for p in ref[lo:hi]]),
            np.array([p["bpp"] for p in test[lo:hi]]),
            np.array([p["psnr"] for p in test[lo:hi]]))

    mid = len(QPS) // 2
    return {"low": bd(0, mid), "high": bd(mid, len(QPS)),
            "full": bd(0, len(QPS))}


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "library256"
    frame = FRAMES[which]()
    print(f"{which}: {frame.shape}")
    full = load_bundle()
    single = single_only(full)

    configs = [("regular", None, "regular")]
    for policy in ("substitution", "switch"):
        configs.append((policy, single, f"{policy}_single"))
        configs.append((policy, full, f"{policy}_pair"))

    points = {}
    for policy, bundle, name in configs:
        print(f"{which} {name}:")
        points[name] = [run_point(frame, qp, policy, bundle,
                                  f"{which}_{name}") for qp in QPS]
        # Incremental summary: every completed config lands in the artifact
        # even if a later config is cut off by the wall clock.
        out = {"frame": which, "qps": QPS,
               "encode_s_mean": {n: float(np.mean([p["encode_s"]
                                                   for p in pts]))
                                 for n, pts in points.items()},
               "points": points}
        for n in points:
            if n == "regular":
                continue
            out[f"bd_{n}_vs_regular"] = bd_lhf(points["regular"], points[n])
            print(n, out[f"bd_{n}_vs_regular"], flush=True)
        with open(f"artifacts/rd_protocol_{which}.json", "w") as f:
            json.dump(out, f, indent=1)
    print(f"-> artifacts/rd_protocol_{which}.json")


if __name__ == "__main__":
    main()
