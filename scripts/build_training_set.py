"""Builds the luminance training set for 16x16/32x32 PNN training.

The environment has no egress, so instead of ILSVRC (reference
`untaring_ilsvrc2012_training.py`) the set is built from every distinct
photographic image available locally, EXCLUDING `rgb_library.jpg` which is the
held-out RD/prediction evaluation image.  Each source path is repeated many
times so `create_training_shards` (one random 320x320 crop per path entry)
yields a few hundred distinct crops; the input pipeline then applies random
rot90/flip/position augmentation on the fly per example.
"""

import argparse
import os
import sys

sys.path.insert(0, "/root/repo")

from context_adaptive_neural_network_based_prediction_tpu.data import datasets

SOURCES = [
    "/root/reference/hevc/visualization/map_intra_prediction_modes/readme/luminance_cactus.png",
    "/root/reference/hevc/visualization/map_intra_prediction_modes/readme/luminance_kimono.png",
    "/root/reference/hevc/visualization/map_intra_prediction_modes/readme/luminance_parkscene.png",
    "/root/reference/hevc/pseudo_data/new_york.jpg",
    "/root/reference/hevc/pseudo_data/rgb_cliff.jpg",
    "/root/reference/sets/pseudo_data/rgb_bride.jpg",
    "/root/reference/sets/pseudo_data/rgb_jewelry.jpg",
    "/root/reference/sets/pseudo_data/rgb_web.jpg",
]


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--output-dir", default="artifacts/training_set/luminance")
    p.add_argument("--repeats", type=int, default=80,
                   help="random 320x320 crops drawn per source image")
    p.add_argument("--pair", action="store_true")
    p.add_argument("--width", type=int, default=None,
                   help="4 or 8: write offline (above,left,target) triplet "
                        "shards for FC training (reference sets/writing.py "
                        "w in {4,8} mode); omit for 320x320 crop shards")
    args = p.parse_args()

    paths = [s for s in SOURCES for _ in range(args.repeats)]
    n = datasets.create_training_shards(paths, args.output_dir,
                                        width_target=args.width,
                                        is_pair=args.pair)
    mean = datasets.compute_luminance_mean(SOURCES)
    mean_path = datasets.save_mean_training(
        mean, os.path.join(args.output_dir, "means"))
    print(f"wrote {n} crops under {args.output_dir}; mean {mean:.4f} -> {mean_path}")


if __name__ == "__main__":
    main()
