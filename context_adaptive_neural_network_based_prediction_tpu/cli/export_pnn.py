"""Exports trained PNN params for codec inference + writes graph manifests.

Reference parity: `freezing_graph_pnn.py` (frozen-graph production) and the
three-key manifest files `hevc/hm_common/paths_to_graphs_output/{single,pair}.txt`
(lines "width,is_pair,channel_idx,path", parsed codec-side by
`tools.h:105-108`).  Here "freezing" = converting a training checkpoint to an
inference-only .npz (params only, no optimizer state).
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from ..models import training


def freeze_checkpoint(path_to_ckpt: str, path_to_npz: str) -> None:
    state = training.restore_checkpoint(path_to_ckpt, 0)
    flat = {}

    def walk(node, prefix):
        for k, v in node.items():
            if isinstance(v, dict):
                walk(v, prefix + k + "/")
            else:
                flat[prefix + k] = np.asarray(v)

    walk(state.params, "")
    os.makedirs(os.path.dirname(path_to_npz) or ".", exist_ok=True)
    np.savez(path_to_npz, **flat)


def parse_manifest(path: str) -> dict:
    """Parses "width,is_pair,channel,path" lines -> {(width, is_pair): path}."""
    table = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            width, is_pair, _channel, model_path = line.split(",", 3)
            table[(int(width), bool(int(is_pair)))] = model_path
    return table


def write_manifest(table: dict, path: str) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        for (width, is_pair), model_path in sorted(table.items()):
            f.write(f"{width},{int(is_pair)},0,{model_path}\n")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("checkpoint", help="path to model_<step>.ckpt.pkl")
    p.add_argument("output", help="output .npz path")
    args = p.parse_args()
    freeze_checkpoint(args.checkpoint, args.output)
    print(f"froze {args.checkpoint} -> {args.output}")


if __name__ == "__main__":
    main()
