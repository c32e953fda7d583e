"""Freezes the latest training snapshots into compressed inference npz files
under artifacts/frozen/, sanity-checks each with a forward pass, and rewrites
manifest_trained.txt to list EXACTLY the files frozen (so a fresh container
never hits dangling manifest entries)."""

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

RESULTS = "artifacts/pnn_results"
JOBS = [
    # (width, arch, is_pair)
    (4, "fully_connected", False),
    (4, "fully_connected", True),
    (8, "fully_connected", False),
    (8, "fully_connected", True),
    (16, "convolutional", False),
    (16, "convolutional", True),
    (32, "convolutional", False),
    (32, "convolutional", True),
    (64, "convolutional", False),
    (64, "convolutional", True),
]


def freeze(width, arch, is_pair):
    ckpt_dir = os.path.join(
        RESULTS, f"width_target_{width}", arch,
        "pair" if is_pair else "single", "luminance", "1_0",
        "masks_tr_random")
    ckpts = glob.glob(os.path.join(ckpt_dir, "model_*.ckpt.pkl"))
    if not ckpts:
        print(f"skip w{width} {arch} pair={is_pair}: no checkpoints")
        return None
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
    suffix = "_fc" if arch == "fully_connected" else ""
    out = f"artifacts/frozen/pnn_w{width}{suffix}_{tag}.npz"
    np.savez_compressed(out, **flat)
    # Sanity forward through the canonical loader.
    params = importer.load_npz_params(out)
    if arch == "fully_connected":
        ctx = np.zeros((2, 5 * width * width), np.float32)
        pred = pnn.fc_forward(params["fully_connected"], ctx, width)
    else:
        above = np.zeros((2, width, 3 * width, 1), np.float32)
        left = np.zeros((2, 2 * width, width, 1), np.float32)
        pred = pnn.conv_forward(params["convolutional"], above, left, width)
    assert np.all(np.isfinite(np.asarray(pred))), "non-finite prediction"
    step = int(re.search(r"model_(\d+)", latest).group(1))
    print(f"froze {latest} (step {step}) -> {out} "
          f"({os.path.getsize(out)/1e6:.1f} MB)")
    return width, is_pair, out


if __name__ == "__main__":
    entries = []
    for width, arch, is_pair in JOBS:
        got = freeze(width, arch, is_pair)
        if got:
            entries.append(got)
    # Include frozen models from previous rounds whose checkpoints are no
    # longer on disk (git preserves the npz across container resets).
    have = {p for _, _, p in entries}
    for path in sorted(glob.glob("artifacts/frozen/pnn_w*.npz")):
        if path in have:
            continue
        m = re.match(r".*/pnn_w(\d+)(_fc|_refconv)?_(single|pair)\.npz",
                     path)
        if m:
            entries.append((int(m.group(1)), m.group(3) == "pair", path))
    # Three-key manifest (width, is_pair, channel, path) listing only files
    # that exist.  Collisions per (width, is_pair) rank by quality:
    # reference-imported conv weights ("refconv", the shipped 800k-iter
    # zoo, checkpoint-parity-tested) beat anything trained on the 8 local
    # photos, then the reference's per-width architecture (FC for 4/8,
    # conv for 16+).  Pair models have no reference checkpoint, so the
    # local ones are the only candidates there.
    def rank(width, path):
        if "_refconv_" in path:
            return 2
        is_fc = "_fc_" in path
        return 1 if is_fc == (width <= 8) else 0

    pref = {}
    for width, is_pair, path in entries:
        key = (width, is_pair)
        if key not in pref or rank(width, path) > rank(width, pref[key]):
            pref[key] = path
    with open("artifacts/frozen/manifest_trained.txt", "w") as f:
        for (width, is_pair), path in sorted(pref.items()):
            f.write(f"{width},{1 if is_pair else 0},0,/root/repo/{path}\n")
    print("manifest_trained.txt rewritten with", len(pref), "entries")
