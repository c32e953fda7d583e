"""Builds the training set + channel means (SURVEY P4/P23 equivalent).

Reference parity: `creating_training_set.py` + `preprocessing.py` - walk a
directory of RGB images, write sharded training data (optionally the "pair"
variant whose contexts carry this framework's compression artifacts), and
compute/store the channel mean.
"""

from __future__ import annotations

import argparse
import glob
import os

from ..data import datasets
from ..utils import parsing


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--images", required=True, help="glob of RGB training images")
    p.add_argument("--output-dir", required=True)
    p.add_argument("--width-target", type=int, default=None,
                   help="4 or 8 for offline triplets; omit for 320x320 crops")
    p.add_argument("--pair", action="store_true",
                   help="compress contexts with the in-framework codec")
    p.add_argument("--shards", type=parsing.int_strictly_positive, default=4)
    p.add_argument("--triplets-per-image", type=int, default=10)
    args = p.parse_args()

    paths = sorted(glob.glob(args.images))
    if not paths:
        raise SystemExit(f"no images match {args.images}")
    n = datasets.create_training_shards(
        paths, args.output_dir, width_target=args.width_target,
        nb_shards=args.shards, triplets_per_image=args.triplets_per_image,
        is_pair=args.pair)
    mean = datasets.compute_luminance_mean(paths)
    mean_path = datasets.save_mean_training(
        mean, os.path.join(args.output_dir, "means", "luminance"))
    print(f"wrote {n} examples under {args.output_dir}; mean {mean:.4f} -> {mean_path}")


if __name__ == "__main__":
    main()
