"""Freezes the latest training snapshots into compressed inference npz files
under artifacts/frozen/ and sanity-checks each with a forward pass."""

import glob
import os
import re
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

from context_adaptive_neural_network_based_prediction_tpu.models import (
    importer, pnn, training)

JOBS = [
    # (width, is_pair, results subtree)
    (32, False, "artifacts/pnn_results/width_target_32/convolutional/single/"
                "luminance/1_0/masks_tr_random"),
    (64, False, "artifacts/pnn_results/width_target_64/convolutional/single/"
                "luminance/1_0/masks_tr_random"),
    (32, True, "artifacts/pnn_results/width_target_32/convolutional/pair/"
               "luminance/1_0/masks_tr_random"),
]


def freeze(width, is_pair, ckpt_dir):
    ckpts = glob.glob(os.path.join(ckpt_dir, "model_*.ckpt.pkl"))
    if not ckpts:
        print(f"skip w{width} pair={is_pair}: no checkpoints in {ckpt_dir}")
        return
    latest = max(ckpts, key=lambda p: int(re.search(r"model_(\d+)", p).group(1)))
    state = training.restore_checkpoint(latest, width)
    flat = {}

    def walk(node, prefix):
        for k, v in node.items():
            if isinstance(v, dict):
                walk(v, prefix + k + "/")
            else:
                flat[prefix + k] = np.asarray(v)

    walk(state.params, "")
    tag = "pair" if is_pair else "single"
    out = f"artifacts/frozen/pnn_w{width}_{tag}.npz"
    np.savez_compressed(out, **flat)
    # Sanity forward through the canonical loader.
    params = importer.load_npz_params(out)
    above = np.zeros((2, width, 3 * width, 1), np.float32)
    left = np.zeros((2, 2 * width, width, 1), np.float32)
    pred = pnn.conv_forward(params["convolutional"], above, left, width)
    assert np.all(np.isfinite(np.asarray(pred))), "non-finite prediction"
    step = int(re.search(r"model_(\d+)", latest).group(1))
    print(f"froze {latest} (step {step}) -> {out} "
          f"({os.path.getsize(out)/1e6:.1f} MB)")


if __name__ == "__main__":
    for width, is_pair, d in JOBS:
        freeze(width, is_pair, d)
