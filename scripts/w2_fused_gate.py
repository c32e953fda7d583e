"""Byte-identity gate for the fused Pallas unit kernels, on real TPU.

Encodes small frames through wavefront2 with CANP_FUSED_UNIT=pallas and
again with the fused path disabled, and asserts bitstream + reconstruction
equality.  This is the end-to-end complement of tests/test_unit_fused.py's
per-trial exactness: it exercises the kernels inside the full scan
machinery (halo-free), the native packer, and every policy.

Usage: python scripts/w2_fused_gate.py
"""

import hashlib
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from context_adaptive_neural_network_based_prediction_tpu.evaluation import (
    hm_driver)
from context_adaptive_neural_network_based_prediction_tpu.models import zoo
from context_adaptive_neural_network_based_prediction_tpu.parallel import (
    wavefront2)

OWN_MEAN_PKL = "artifacts/training_set/luminance/means/mean_training.pkl"


def load_bundle():
    with open(OWN_MEAN_PKL, "rb") as f:
        own_mean = float(pickle.load(f))
    with open("/root/reference/sets/results/training_set/means/luminance/"
              "mean_training.pkl", "rb") as f:
        ref_mean = float(pickle.load(f, encoding="latin1"))
    means = {4: ref_mean, 8: ref_mean, 16: own_mean, 32: own_mean,
             64: own_mean}
    return zoo.load_codec_bundle(
        "artifacts/frozen/manifest_trained.txt", means,
        quantized_manifest_path="artifacts/frozen/manifest_quantized.txt")


def digest(res):
    h = hashlib.sha256()
    h.update(res.bitstream)
    h.update(np.ascontiguousarray(res.reconstruction).tobytes())
    return h.hexdigest()


def main():
    park = hm_driver.load_luminance(
        "/root/reference/hevc/visualization/map_intra_prediction_modes/"
        "readme/luminance_parkscene.png")[400:528, 600:792]
    bundle = load_bundle()
    configs = [("regular", 32, None), ("substitution", 32, bundle),
               ("switch", 32, bundle), ("regular", 64, None),
               ("switch", 64, bundle)]
    fail = 0
    for policy, ctb, pnn in configs:
        frame = park[:128, :192] if ctb == 32 else park[:128, :128]
        digests = {}
        for impl in ("pallas", "0"):
            os.environ["CANP_FUSED_UNIT"] = impl
            wavefront2._W2_CACHE.clear()
            res = wavefront2.encode_frame_wavefront2(
                frame, 32, policy=policy, pnn=pnn, ctb=ctb)
            digests[impl] = digest(res)
        ok = digests["pallas"] == digests["0"]
        fail += not ok
        print(f"{policy}/ctb{ctb}: {'OK' if ok else 'MISMATCH'} "
              f"{digests['pallas'][:16]}", flush=True)
    print("FUSED GATE:", "PASS" if not fail else f"{fail} FAILURES")
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
