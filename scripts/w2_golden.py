"""Golden bit-exactness harness for wavefront2 restructures.

The wavefront2 encoder's decisions are all fixed-point/integer, so ANY
refactor that does not change the math must reproduce the output streams
BYTE-identically.  This captures (or checks) sha256 digests of the
bitstream + reconstruction for a matrix of configs on small frames, giving
a fast regression gate while restructuring the program for speed.

Usage:  python scripts/w2_golden.py capture   # write /tmp/w2_golden.json
        python scripts/w2_golden.py check     # compare against it
"""

import hashlib
import json
import pickle
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

from context_adaptive_neural_network_based_prediction_tpu.evaluation import (
    hm_driver)
from context_adaptive_neural_network_based_prediction_tpu.models import zoo
from context_adaptive_neural_network_based_prediction_tpu.parallel import (
    wavefront2)

GOLDEN = "/tmp/w2_golden.json"
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


def frames():
    rng = np.random.default_rng(5)
    yy, xx = np.mgrid[0:64, 0:96]
    synth = np.clip(128 + 45 * np.sin(xx / 11.0) + 35 * np.cos(yy / 8.0)
                    + rng.normal(0, 7, (64, 96)), 0, 255).astype(np.uint8)
    park = hm_driver.load_luminance(
        "/root/reference/hevc/visualization/map_intra_prediction_modes/"
        "readme/luminance_parkscene.png")[400:528, 600:792]  # 128x192
    return {"synth64x96": synth, "park128x192": park}


def digest(res):
    h = hashlib.sha256()
    h.update(res.bitstream)
    h.update(np.ascontiguousarray(res.reconstruction).tobytes())
    return h.hexdigest()


def run_all():
    bundle = load_bundle()
    out = {}
    for fname, frame in frames().items():
        for policy in ("regular", "substitution", "switch"):
            pnn = bundle if policy != "regular" else None
            for ctb in (32, 64):
                for nxn in (True, False):
                    if ctb == 64 and (policy == "substitution" or not nxn):
                        continue   # keep the matrix small
                    if fname == "synth64x96" and ctb == 64:
                        continue   # 64x96 is not a 64-multiple
                    key = f"{fname}/{policy}/ctb{ctb}/nxn{int(nxn)}"
                    res = wavefront2.encode_frame_wavefront2(
                        frame, 32, policy=policy, pnn=pnn, ctb=ctb,
                        enable_nxn=nxn)
                    out[key] = digest(res)
                    print(key, out[key][:16], flush=True)
    return out


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "check"
    got = run_all()
    if mode == "capture":
        with open(GOLDEN, "w") as f:
            json.dump(got, f, indent=1)
        print(f"captured {len(got)} digests -> {GOLDEN}")
        return
    with open(GOLDEN) as f:
        want = json.load(f)
    bad = {k for k in want if got.get(k) != want[k]}
    missing = set(want) - set(got)
    if bad or missing:
        for k in sorted(bad):
            print(f"MISMATCH {k}: {want[k][:16]} -> {got.get(k, '?')[:16]}")
        sys.exit(1)
    print(f"OK: {len(want)} configs byte-identical")


if __name__ == "__main__":
    main()
