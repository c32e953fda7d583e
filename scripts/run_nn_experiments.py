"""In-loop NN coding experiment with the FULL width zoo (4/8/16/32).

Models: the reference's shipped convolutional checkpoints for 4x4/8x8
(the only widths whose .ckpt data files exist in /root/reference) imported
into JAX, plus this framework's locally trained 16x16/32x32 convolutional
models (scripts/build_training_set.py data; rgb_library held out).

Experiment (reference Tables IX-X analog, `comparing_rate_distortion.py`):
encode the held-out rgb_library luma crop with the three policies at the
high-QP half of the reference protocol, report BD-rate of substitution /
switch vs regular.
"""

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

from context_adaptive_neural_network_based_prediction_tpu.cli.export_pnn import (
    freeze_checkpoint)
from context_adaptive_neural_network_based_prediction_tpu.codec.nn_intra import (
    PnnBundle, PnnPredictor)
from context_adaptive_neural_network_based_prediction_tpu.evaluation import (
    hm_driver, performance)
from context_adaptive_neural_network_based_prediction_tpu.models import (
    importer, training)

REF = "/root/reference/pnn/results"
OWN = "artifacts/pnn_results"
FROZEN = "artifacts/frozen"
REF_MEAN_PKL = "/root/reference/sets/results/training_set/means/luminance/mean_training.pkl"
OWN_MEAN_PKL = "artifacts/training_set/luminance/means/mean_training.pkl"


def load_bundle():
    with open(REF_MEAN_PKL, "rb") as f:
        ref_mean = float(pickle.load(f, encoding="latin1"))
    with open(OWN_MEAN_PKL, "rb") as f:
        own_mean = float(pickle.load(f))

    params = {}
    arch = {}
    means = {}
    for w in (4, 8):
        ckpt = (f"{REF}/width_target_{w}/convolutional/single/luminance/"
                "1_0/masks_tr_random/model_800000.ckpt")
        params[w] = importer.import_tf_checkpoint(ckpt)
        arch[w] = False
        means[w] = ref_mean
    pair_params = {}
    for w in (16, 32):
        for kind, store in (("single", params), ("pair", pair_params)):
            path, step = training.find_latest_checkpoint(
                f"{OWN}/width_target_{w}/convolutional/{kind}/luminance/"
                "1_0/masks_tr_random")
            if path is None:
                print(f"width {w} {kind}: no trained checkpoint, skipping")
                continue
            state = training.restore_checkpoint(path, w)
            store[w] = state.params
            arch[w] = False
            means[w] = own_mean
            os.makedirs(FROZEN, exist_ok=True)
            freeze_checkpoint(path, f"{FROZEN}/pnn_w{w}_{kind}.npz")
            print(f"width {w} {kind}: using {path} (step {step})")
    return PnnBundle(params, arch, means,
                     pair_params=pair_params if pair_params else None)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--qps", type=int, nargs="+", default=[27, 32, 37, 42])
    p.add_argument("--policies", nargs="+",
                   default=["regular", "substitution", "switch"])
    p.add_argument("--cache-dir", default="artifacts/rd_cache_fullzoo")
    args = p.parse_args()

    bundle = load_bundle()
    pnn = PnnPredictor(bundle)
    luma = hm_driver.load_luminance(
        "/root/reference/hevc/pseudo_data/rgb_library.jpg")
    frame = luma[:args.size, :args.size]

    all_points = {}
    for policy in args.policies:
        cache = os.path.join(args.cache_dir, f"library{args.size}_{policy}.pkl")
        points = performance.compute_or_load_rates_psnrs(
            frame, args.qps, path_to_cache=cache, policy=policy,
            pnn=pnn if policy != "regular" else None)
        all_points[policy] = points
        for pt in points:
            print(f"{policy} QP{pt.qp}: {pt.rate_bpp:.5f} bpp "
                  f"{pt.psnr_db:.3f} dB ({pt.encode_time_s:.0f}s)", flush=True)

    for policy in args.policies:
        if policy == "regular" or "regular" not in all_points:
            continue
        bd = performance.bd_rate_low_high_full(all_points["regular"],
                                               all_points[policy])
        print(f"BD-rate {policy} vs regular: low {bd['low']:+.2f}% "
              f"high {bd['high']:+.2f}% full {bd['full']:+.2f}%")


if __name__ == "__main__":
    main()
