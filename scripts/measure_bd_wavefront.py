"""BD-rate of the TPU wavefront encoders' HM-conformant streams vs
HM-16.15 (NAL-exact), optionally with the NEURAL policies on-device.

The wavefront paths trade RD for massive throughput (whole-frame XLA
program); this publishes the quality cost of that trade next to the speed:
v1 = fixed 16x16 grid, v2 = CTB-32 with an on-device quadtree 32->16->8.

With policy=substitution/switch the device encoder runs the quantized PNN
batched inside the wavefront program (the reference's per-TB Session::Run
restructured, `TComPrediction.cpp:556-607`); every stream is decoded back
through the sequential host decoder and asserted bit-exact, so the BD
numbers are for decodable normative streams.  Reported: BD vs HM-16.15 and
BD vs the regular-policy wavefront (the isolated on-device NN coding gain).

Usage: measure_bd_wavefront.py [parkscene|rgb_library] [v1|v2|v2c64]
                               [regular|substitution|switch]

v2c64 = wavefront2 with the 64x64 CU level (CTB 64 depth 4, HM's AI
geometry); the comparison frame is cropped to a 64-multiple.
"""

import json
import pickle
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import os

import jax

# Default: CPU (deterministic, no tunnel dependency).  CANP_BD_PLATFORM=axon
# runs the device encodes on the real TPU; the host decode + bit-exactness
# assertions still run in numpy, so a passing run PROVES the TPU-encoded
# streams decode bit-exactly on the host — the quantized normative forward
# and integer decision sums make encode platform-independent by design.
jax.config.update("jax_platforms",
                  os.environ.get("CANP_BD_PLATFORM", "cpu"))

from context_adaptive_neural_network_based_prediction_tpu.codec import (
    hm_decoder, nn_intra)
from context_adaptive_neural_network_based_prediction_tpu.evaluation import (
    hm_driver)
from context_adaptive_neural_network_based_prediction_tpu.models import zoo
from context_adaptive_neural_network_based_prediction_tpu.parallel import (
    wavefront, wavefront2)
from context_adaptive_neural_network_based_prediction_tpu.utils import metrics
from scripts.forced_structure_probe import hm_encode

# forced_structure_probe pins jax_platforms to CPU at import; restore the
# requested platform so CANP_BD_PLATFORM=axon really runs on the TPU.
jax.config.update("jax_platforms",
                  os.environ.get("CANP_BD_PLATFORM", "cpu"))

QPS = [22, 27, 32, 37, 42]
OWN_MEAN_PKL = "artifacts/training_set/luminance/means/mean_training.pkl"


def load_bundle():
    """The codec zoo: shipped reference conv 4/8 (800k steps, reference
    training mean) + locally trained 16/32 single+pair and 64 single (local
    mean), with the frozen quantized normative twins."""
    with open(OWN_MEAN_PKL, "rb") as f:
        own_mean = float(pickle.load(f))
    with open("/root/reference/sets/results/training_set/means/luminance/"
              "mean_training.pkl", "rb") as f:
        ref_mean = float(pickle.load(f, encoding="latin1"))
    means = {4: ref_mean, 8: ref_mean, 16: own_mean, 32: own_mean,
             64: own_mean}
    # use_pair=False: the locally trained pair models lose to the singles
    # they replace (8-photo corpus; RESULTS.md), so headline device BD uses
    # the singles-only config (an encoder/decoder config both sides share).
    return zoo.load_codec_bundle(
        "artifacts/frozen/manifest_trained.txt", means,
        quantized_manifest_path="artifacts/frozen/manifest_quantized.txt",
        use_pair=False)


def run_points(frame, ver, policy, bundle):
    h, w = frame.shape
    pts = []
    for qp in QPS:
        if ver in ("v2", "v2c64"):
            stream, res = wavefront2.encode_frame_wavefront2_hm(
                frame, qp, policy=policy,
                pnn=bundle if policy != "regular" else None,
                ctb=64 if ver == "v2c64" else 32)
        else:
            assert policy == "regular", "v1 has no NN path"
            stream, res = wavefront.encode_frame_wavefront_hm(frame, qp)
        kw = {}
        if policy != "regular":
            kw = dict(policy=policy, pnn=nn_intra.PnnPredictor(bundle),
                      use_native="never")
        hd = hm_decoder.decode_hm_stream(stream, **kw)
        assert hd.hash_checked and hd.hash_ok
        assert np.array_equal(hd.reconstruction, res.reconstruction)
        pts.append((len(stream) * 8 / (h * w),
                    float(metrics.compute_psnr(frame, hd.reconstruction))))
        print(f"  QP{qp}: {pts[-1][0]:.5f} bpp {pts[-1][1]:.3f} dB",
              flush=True)
    return pts


def bd_table(ref, test):
    def bd(lo, hi):
        return metrics.compute_bjontegaard(
            np.array([p[0] for p in ref[lo:hi]]),
            np.array([p[1] for p in ref[lo:hi]]),
            np.array([p[0] for p in test[lo:hi]]),
            np.array([p[1] for p in test[lo:hi]]))

    return {"low": bd(0, 3), "high": bd(2, 5), "full": bd(0, 5)}


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "parkscene"
    ver = sys.argv[2] if len(sys.argv) > 2 else "v2"
    policy = sys.argv[3] if len(sys.argv) > 3 else "regular"
    if which == "parkscene":
        # 416x224: multiple of 32 for the v2 CTB grid (384x192 for CTB 64).
        frame = hm_driver.load_luminance(
            "/root/reference/hevc/visualization/map_intra_prediction_modes/"
            "readme/luminance_parkscene.png")[400:624, 600:1016]
    elif which == "parkscene1080":
        # The FULL 1080p frame the throughput benchmarks time - BD and fps
        # on the same stream (round-5 task 3; round 4 stapled a 416x224
        # crop's BD onto the 1080p fps metric).
        full = hm_driver.load_luminance(
            "/root/reference/hevc/visualization/map_intra_prediction_modes/"
            "readme/luminance_parkscene.png")
        frame = full[:(full.shape[0] // 32) * 32,
                     :(full.shape[1] // 32) * 32]
    else:
        frame = hm_driver.load_luminance(
            "/root/reference/hevc/pseudo_data/rgb_library.jpg")[:384, :384]
    if ver == "v2c64":
        h64 = (frame.shape[0] // 64) * 64
        w64 = (frame.shape[1] // 64) * 64
        frame = frame[:h64, :w64]
    h, w = frame.shape

    bundle = load_bundle() if policy != "regular" else None
    print(f"{which} {ver} policy={policy}:")
    ours = run_points(frame, ver, policy, bundle)
    hm = []
    for qp in QPS:
        hm_stream, hm_rec = hm_encode(frame, qp)
        hm.append((len(hm_stream) * 8 / (h * w),
                   float(metrics.compute_psnr(frame, hm_rec))))

    out = {"vs_hm": bd_table(hm, ours), "wavefront": ours, "hm": hm,
           "qps": QPS, "frame": which, "version": ver, "policy": policy}
    if policy != "regular":
        print("  regular-policy wavefront baseline:")
        reg = run_points(frame, ver, "regular", None)  # same ver/ctb
        out["vs_wavefront_regular"] = bd_table(reg, ours)
        out["wavefront_regular"] = reg
    print(json.dumps({k: out[k] for k in out
                      if k.startswith("vs_")}, indent=1))
    suffix = "" if policy == "regular" else f"_{policy}"
    if os.environ.get("CANP_RATE_EVOLVE") == "1":
        suffix += "_evolve"
    path = f"artifacts/bd_wavefront_{ver}{suffix}_{which}.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"-> {path}")


if __name__ == "__main__":
    main()
