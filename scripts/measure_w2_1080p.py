"""1080p wavefront2 device throughput + NN-policy compile check (round 4).

Measures b=1 (and optional b=N) steady fps for the given policy/config at
1080p (1056x1920, the 32/64-multiple crop geometry used by the round-3
frontier table), on the real TPU.  For NN policies this doubles as the
task-2 gate: round 3's switch program could not finish XLA compilation at
1080p; the deduped class tables are expected to fix that.

Usage: measure_w2_1080p.py [policy] [ctb] [batch] [--no-nxn]
"""

import json
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

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


def main():
    policy = sys.argv[1] if len(sys.argv) > 1 else "regular"
    ctb = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    nxn = "--no-nxn" not in sys.argv
    frame = hm_driver.load_luminance(
        "/root/reference/hevc/visualization/map_intra_prediction_modes/"
        "readme/luminance_parkscene.png")
    h = (frame.shape[0] // ctb) * ctb
    w = (frame.shape[1] // ctb) * ctb
    frame = frame[:h, :w]
    qp = 32
    bundle = load_bundle() if policy != "regular" else None

    t0 = time.time()
    if batch == 1:
        run = wavefront2._jitted_wavefront2(h, w, qp, 1.0, policy, bundle,
                                            ctb=ctb, enable_nxn=nxn)
        arg = jnp.asarray(frame)
    else:
        run = wavefront2._jitted_wavefront2_batch(h, w, qp, 1.0, policy,
                                                  bundle, ctb, nxn,
                                                  n_frames=batch)
        arg = jnp.asarray(np.stack([frame] * batch))
    def materialize(out):
        # np.asarray of the reconstruction, not block_until_ready: the
        # axon backend's readiness signal can return before results exist
        # for repeated dispatches (observed as a bogus 31011 fps).  The
        # recon depends on every wavefront step, so pulling its 2 MB back
        # forces the full computation without billing the ys transfer
        # (which encode_stream overlaps with compute in production).
        np.asarray(out[0])

    materialize(run(arg))
    compile_s = time.time() - t0
    print(f"{policy} ctb{ctb} b={batch} nxn={nxn} {h}x{w}: "
          f"compile+first {compile_s:.1f}s", flush=True)
    times = []
    for _ in range(3):
        t0 = time.time()
        materialize(run(arg))
        times.append(time.time() - t0)
    dt = min(times)
    fps = batch / dt
    print(f"  steady {dt:.3f}s -> {fps:.3f} fps", flush=True)
    rec = {"policy": policy, "ctb": ctb, "batch": batch, "nxn": nxn,
           "hw": f"{h}x{w}", "compile_s": round(compile_s, 1),
           "steady_s": round(dt, 4), "fps": round(fps, 4)}
    try:
        hist = json.load(open("artifacts/w2_1080p_round4.json"))
    except FileNotFoundError:
        hist = []
    hist = [r for r in hist if not all(
        r.get(k) == rec[k] for k in ("policy", "ctb", "batch", "nxn"))]
    hist.append(rec)
    json.dump(hist, open("artifacts/w2_1080p_round4.json", "w"), indent=1)


if __name__ == "__main__":
    main()
