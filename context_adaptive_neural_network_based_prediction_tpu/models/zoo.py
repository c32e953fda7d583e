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


# ------------------------------------------------------- frozen-zoo loading --

def load_frozen_params(path: str):
    """Loads a frozen .npz (cli/export_pnn.freeze_checkpoint layout) back into
    the nested param-pytree convention.  Returns (params, is_fully_connected).
    """
    import jax.numpy as jnp

    with np.load(path) as data:
        params: dict = {}
        for key in data.files:
            node = params
            parts = key.split("/")
            for part in parts[:-1]:
                node = node.setdefault(part, {})
            node[parts[-1]] = jnp.asarray(data[key])
    return params, "fully_connected" in params


def load_codec_bundle(manifest_path: str, mean_training,
                      quantized_manifest_path: str = None,
                      use_pair: bool = True):
    """Three-key manifest (width,is_pair,channel,path — the reference's
    `paths_to_graphs_output/*.txt` format, `tools.h:105-108`) -> PnnBundle.

    `quantized_manifest_path` optionally adds the frozen deterministic
    integer models (`models/pnn_q.py`) required by the device wavefront
    encoder; widths present there become the codec's normative forward.

    `use_pair=False` drops the pair entries, disabling the QP>=32 pair
    selection rule (`TComPrediction.cpp:155-170`) as an encoder/decoder
    CONFIG (both sides must agree).  The reference default stays True; the
    local zoo's pair models are trained on 8 photos and measurably lose to
    the singles they replace (RESULTS.md), so the evaluation scripts pass
    False for headline numbers.
    """
    from ..cli.export_pnn import parse_manifest
    from ..codec.nn_intra import PnnBundle

    table = parse_manifest(manifest_path)
    params, pair_params, arch = {}, {}, {}
    for (width, is_pair), path in table.items():
        if is_pair and not use_pair:
            continue
        p, is_fc = load_frozen_params(path)
        if not is_pair:
            arch[width] = is_fc
        (pair_params if is_pair else params)[width] = p
    for width in pair_params:
        arch.setdefault(width, "fully_connected" in pair_params[width])
    quantized = pair_quantized = None
    if quantized_manifest_path and os.path.isfile(quantized_manifest_path):
        from . import pnn_q

        quantized, pair_quantized = {}, {}
        for (width, is_pair), path in parse_manifest(
                quantized_manifest_path).items():
            if is_pair and not use_pair:
                continue
            q = pnn_q.load_quantized(path)
            (pair_quantized if is_pair else quantized)[width] = q
        pair_quantized = pair_quantized or None
    return PnnBundle(params, arch, mean_training,
                     pair_params=pair_params or None,
                     quantized=quantized, pair_quantized=pair_quantized)
