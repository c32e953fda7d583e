"""Model-zoo directory conventions and batched inference.

Parity with the reference's convention-over-config tree
(`training_pnn.py:60-113`):

    <root>/width_target_<w>/<fully_connected|convolutional>/<single|pair>/
        <channel>/<coeff_l2>_<coeff_grad>/masks_tr_<spec>/

and with `pnn/batching.py:7-88` (batched feed inference) - here batching is
just one jitted call over the whole array, chunked only to bound memory.
"""

from __future__ import annotations

import os

import numpy as np

from . import pnn


def model_directory(root: str, width_target: int, is_fully_connected: bool,
                    is_pair: bool, channel: str, coeff_l2: float, coeff_grad: float,
                    tuple_width_height_masks_tr) -> str:
    arch = "fully_connected" if is_fully_connected else "convolutional"
    pair = "pair" if is_pair else "single"

    def fmt(c):
        s = f"{c:g}".replace(".", "_")
        return s
    coeffs = f"{fmt(coeff_l2)}_{fmt(coeff_grad)}"
    if tuple_width_height_masks_tr:
        masks = "masks_tr_{}_{}".format(*tuple_width_height_masks_tr)
    else:
        masks = "masks_tr_random"
    return os.path.join(root, f"width_target_{width_target}", arch, pair,
                        channel, coeffs, masks)


def predict_by_batch(params: dict, inputs, width_target: int,
                     is_fully_connected: bool, batch_size: int = 1024) -> np.ndarray:
    """Chunked inference over arbitrarily many examples -> (N, w, w, 1) float32."""
    if is_fully_connected:
        n = inputs.shape[0]
        get = lambda lo, hi: inputs[lo:hi]
    else:
        above, left = inputs
        n = above.shape[0]
        get = lambda lo, hi: (above[lo:hi], left[lo:hi])
    outs = []
    for lo in range(0, n, batch_size):
        hi = min(lo + batch_size, n)
        outs.append(np.asarray(
            pnn.forward(params, get(lo, hi), width_target, is_fully_connected)))
    return np.concatenate(outs, axis=0)
