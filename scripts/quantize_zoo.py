"""Freezes the quantized NORMATIVE codec nets from the float zoo.

The quantized integer models (models/pnn_q.py) are the codec's normative NN
artifacts — like the reference's frozen graphs (`freezing_graph_pnn.py`) but
with deterministic integer semantics so batched device encoding and
sequential decoding agree bit-exactly.  They are frozen ONCE here (float
calibration is platform-sensitive; the frozen integer net is not) and
committed under artifacts/frozen/ with a three-key manifest.
"""

import os
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
from PIL import Image

from context_adaptive_neural_network_based_prediction_tpu.cli.export_pnn import (
    parse_manifest, write_manifest)
from context_adaptive_neural_network_based_prediction_tpu.models import (
    pnn_q, zoo)

FROZEN = "artifacts/frozen"
MANIFEST = f"{FROZEN}/manifest_trained.txt"
OUT_MANIFEST = f"{FROZEN}/manifest_quantized.txt"

CALIB_IMAGES = [
    "/root/reference/sets/pseudo_data/rgb_bride.jpg",
    "/root/reference/sets/pseudo_data/rgb_jewelry.jpg",
    "/root/reference/hevc/pseudo_data/new_york.jpg",
    "/root/reference/hevc/pseudo_data/rgb_cliff.jpg",
]


def main():
    imgs = [np.asarray(Image.open(p).convert("L")) for p in CALIB_IMAGES
            if os.path.isfile(p)]
    table = parse_manifest(MANIFEST)
    out = {}
    for (width, is_pair), path in sorted(table.items()):
        params, is_fc = zoo.load_frozen_params(path)
        calib = pnn_q.calibration_contexts(
            width, is_fc, images=imgs or None, n_samples=192)
        q = pnn_q.quantize_pnn(params, calib, width, is_fc)
        kind = "pair" if is_pair else "single"
        qpath = os.path.abspath(f"{FROZEN}/qpnn_w{width}_{kind}.npz")
        pnn_q.save_quantized(qpath, q)
        out[(width, is_pair)] = qpath
        print(f"w{width} {kind} ({'fc' if is_fc else 'conv'}) -> {qpath}")
    write_manifest(out, OUT_MANIFEST)
    print(f"manifest -> {OUT_MANIFEST}")


if __name__ == "__main__":
    main()
