"""Importer for the reference's shipped TensorFlow-1 PNN checkpoints.

Maps TF variable names (e.g. `fully_connected/weights_0`,
`convolutional/branch_above/convolution_0/weights`,
`convolutional/merger/channelwise_fully_connected_merger/biases`) onto this
framework's nested param dicts 1:1 - the scopes were chosen to coincide.  Only
the model variables are imported (Adam slots / global_step are skipped).

TensorFlow is an *optional test-time dependency*: it is imported lazily so the
framework itself never needs it.  Checkpoints can also be converted once to
`.npz` via `convert_checkpoint_to_npz` and loaded TF-free afterwards.
"""

from __future__ import annotations

import numpy as np


def load_tf_checkpoint_arrays(path_to_checkpoint: str) -> dict:
    """Reads all model variables of a TF checkpoint into {name: np.ndarray}."""
    import tensorflow as tf  # lazy: test/tooling dependency only

    reader = tf.train.load_checkpoint(path_to_checkpoint)
    arrays = {}
    for name in reader.get_variable_to_shape_map():
        if "/Adam" in name or name in ("beta1_power", "beta2_power") or \
                name.startswith("learning_rate"):
            continue
        arrays[name] = np.asarray(reader.get_tensor(name))
    return arrays


def arrays_to_params(arrays: dict) -> dict:
    """Converts flat {scope/path/name: array} into the nested param dict."""
    params: dict = {}
    for name, arr in arrays.items():
        node = params
        parts = name.split("/")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = arr.astype(np.float32)
    return params


def import_tf_checkpoint(path_to_checkpoint: str) -> dict:
    """TF checkpoint -> nested param pytree usable by `models.pnn.forward`."""
    return arrays_to_params(load_tf_checkpoint_arrays(path_to_checkpoint))


def convert_checkpoint_to_npz(path_to_checkpoint: str, path_to_npz: str) -> None:
    """One-time conversion so later loads don't need TensorFlow."""
    np.savez(path_to_npz, **load_tf_checkpoint_arrays(path_to_checkpoint))


def load_npz_params(path_to_npz: str) -> dict:
    with np.load(path_to_npz) as data:
        return arrays_to_params({k: data[k] for k in data.files})
