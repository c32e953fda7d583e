"""IPFCN-S baseline (Li et al., "Fully Connected Network-Based Intra
Prediction for Image Coding", TIP 2018) re-implemented in JAX.

Capability parity with the reference's Caffe-based baseline
(`ipfcns/ipfcns.py:9-527`, deploy prototxts `IntraFCN205_deploy_Size*.prototxt`):

* input: two groups of 4+4 = 8 reference lines - above (8, 2w+8) and left
  (2w, 8) - flattened (above first) into a 32w+64 vector;
* per-example preprocessing subtracts the mean over both groups
  (`ipfcns.py:432-486`), and that mean is added back to the output;
* net: fc1(1024) -> PReLU -> fc2(1024) -> PReLU -> fc3(1024) -> PReLU ->
  fc4(w^2), with learned per-channel PReLU slopes;
* weights loadable from a converted caffemodel (npz with keys fc{i}_weights /
  fc{i}_biases / prelu{i}_slopes) or randomly initialized.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

HIDDEN = 1024


def extract_pair_groups_lines_from_channel(channel_single_or_pair_uint8,
                                           width_target: int,
                                           row_1st: int, col_1st: int):
    """(above (8, 2w+8, 1), left (2w, 8, 1)) uint8 reference-line groups."""
    ch = channel_single_or_pair_uint8
    if ch.dtype != np.uint8:
        raise TypeError("channel dtype must be uint8")
    h, w_ch, nc = ch.shape
    w = width_target
    if row_1st < 0 or col_1st < 0 or row_1st + 2 * w + 8 > h or col_1st + 2 * w + 8 > w_ch:
        raise ValueError("extraction exceeds channel bounds")
    i = nc - 1
    above = ch[row_1st:row_1st + 8, col_1st:col_1st + 2 * w + 8, i:i + 1]
    left = ch[row_1st + 8:row_1st + 2 * w + 8, col_1st:col_1st + 8, i:i + 1]
    return above, left


def preprocess_pair_groups(groups_above_uint8, groups_left_uint8):
    """Flattens + per-example mean subtraction.

    Inputs (N, 8, 2w+8, 1) and (N, 2w, 8, 1); returns (flattened (N, 32w+64)
    float32, means (N,) float32).
    """
    a = groups_above_uint8.astype(np.float32)
    l = groups_left_uint8.astype(np.float32)
    n = a.shape[0]
    size = a[0].size + l[0].size
    means = (a.sum(axis=(1, 2, 3)) + l.sum(axis=(1, 2, 3))) / size
    a = a - means[:, None, None, None]
    l = l - means[:, None, None, None]
    flat = np.concatenate([a.reshape(n, -1), l.reshape(n, -1)], axis=1)
    return flat, means


def init_params(key, width_target: int) -> dict:
    w2 = width_target ** 2
    d_in = 32 * width_target + 64
    dims = [(d_in, HIDDEN), (HIDDEN, HIDDEN), (HIDDEN, HIDDEN), (HIDDEN, w2)]
    params = {}
    keys = jax.random.split(key, len(dims))
    for i, ((a, b), k) in enumerate(zip(dims, keys), start=1):
        params[f"fc{i}_weights"] = (1.0 / math.sqrt(a)) * jax.random.normal(k, (a, b))
        params[f"fc{i}_biases"] = jnp.zeros((b,))
        if i < 4:
            params[f"prelu{i}_slopes"] = 0.25 * jnp.ones((b,))
    return params


def prelu(x, slopes):
    return jnp.where(x >= 0, x, slopes * x)


def forward(params: dict, flattened: jnp.ndarray, width_target: int):
    """(N, 32w+64) -> (N, w, w, 1) mean-removed prediction."""
    x = flattened
    for i in range(1, 4):
        x = prelu(jnp.dot(x, params[f"fc{i}_weights"],
                          preferred_element_type=jnp.float32)
                  + params[f"fc{i}_biases"], params[f"prelu{i}_slopes"])
    x = jnp.dot(x, params["fc4_weights"],
                preferred_element_type=jnp.float32) + params["fc4_biases"]
    n = x.shape[0]
    return x.reshape(n, width_target, width_target, 1)


def predict_uint8(params: dict, groups_above_uint8, groups_left_uint8,
                  width_target: int) -> np.ndarray:
    """Full IPFCN-S inference to pixel space (mean added back, clip, round)."""
    flat, means = preprocess_pair_groups(groups_above_uint8, groups_left_uint8)
    pred = np.asarray(forward(params, jnp.asarray(flat), width_target))[..., 0]
    out = np.clip(np.round(pred + means[:, None, None]), 0, 255)
    return out.astype(np.uint8)


def load_npz_params(path: str) -> dict:
    with np.load(path) as data:
        return {k: jnp.asarray(data[k]) for k in data.files}


# ------------------------------------------------ caffemodel import ----
#
# The shipped IPFCN-S weights (`ipfcns/models/ipfcns/*.caffemodel`,
# reference `ipfcns/ipfcns.py:388-430`) are a Caffe NetParameter protobuf.
# pycaffe is unavailable here, so the file is read with a minimal
# schema-less protobuf wire parser: NetParameter.layer = field 100,
# LayerParameter.{name=1, type=2, blobs=7}, BlobProto.{data=5 (packed
# floats), shape=7 (BlobShape.dim=1)}.


def _walk_protobuf(data: bytes):
    """Yields (field_number, wire_type, value) over one message's fields."""
    pos = 0
    n = len(data)
    while pos < n:
        key = 0
        shift = 0
        while True:
            b = data[pos]
            pos += 1
            key |= (b & 0x7F) << shift
            shift += 7
            if not b & 0x80:
                break
        field, wt = key >> 3, key & 7
        if wt == 0:
            v = 0
            shift = 0
            while True:
                b = data[pos]
                pos += 1
                v |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
            yield field, wt, v
        elif wt == 1:
            yield field, wt, data[pos:pos + 8]
            pos += 8
        elif wt == 2:
            ln = 0
            shift = 0
            while True:
                b = data[pos]
                pos += 1
                ln |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
            yield field, wt, data[pos:pos + ln]
            pos += ln
        elif wt == 5:
            yield field, wt, data[pos:pos + 4]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")


def _parse_blob(data: bytes) -> np.ndarray:
    dims = []
    floats = []
    legacy = {}
    for field, wt, v in _walk_protobuf(data):
        if field == 5 and wt == 2:      # packed float data
            floats.append(np.frombuffer(v, dtype="<f4"))
        elif field == 5 and wt == 5:    # unpacked float
            floats.append(np.frombuffer(v, dtype="<f4"))
        elif field == 7 and wt == 2:    # BlobShape
            for f2, w2, v2 in _walk_protobuf(v):
                if f2 == 1 and w2 == 0:
                    dims.append(int(v2))
                elif f2 == 1 and w2 == 2:  # packed varints
                    pos2 = 0
                    while pos2 < len(v2):
                        d = 0
                        shift = 0
                        while True:
                            b = v2[pos2]
                            pos2 += 1
                            d |= (b & 0x7F) << shift
                            shift += 7
                            if not b & 0x80:
                                break
                        dims.append(d)
        elif field in (1, 2, 3, 4) and wt == 0:  # legacy num/chan/h/w
            legacy[field] = int(v)
    arr = np.concatenate(floats) if floats else np.zeros(0, np.float32)
    if not dims and legacy:
        dims = [legacy.get(i, 1) for i in (1, 2, 3, 4)]
    if dims:
        arr = arr.reshape([d for d in dims if d > 0] or (-1,))
    return arr


def parse_caffemodel(path_to_caffemodel: str) -> dict:
    """{layer_name: (layer_type, [blob arrays])} from a caffemodel file."""
    with open(path_to_caffemodel, "rb") as f:
        data = f.read()
    layers = {}
    for field, wt, v in _walk_protobuf(data):
        if field == 100 and wt == 2:    # LayerParameter
            name = ltype = None
            blobs = []
            for f2, w2, v2 in _walk_protobuf(v):
                if f2 == 1 and w2 == 2:
                    name = v2.decode("utf-8", "replace")
                elif f2 == 2 and w2 == 2:
                    ltype = v2.decode("utf-8", "replace")
                elif f2 == 7 and w2 == 2:
                    blobs.append(_parse_blob(v2))
            if name is not None:
                layers[name] = (ltype, blobs)
    return layers


def import_caffemodel(path_to_caffemodel: str) -> dict:
    """Shipped IPFCN-S caffemodel -> this module's param dict.

    Caffe InnerProduct weights are (out, in); transposed to (in, out)."""
    layers = parse_caffemodel(path_to_caffemodel)
    params = {}
    for i in range(1, 5):
        ltype, blobs = layers[f"fc{i}"]
        if ltype not in (None, "InnerProduct"):
            raise ValueError(f"fc{i} is {ltype}, expected InnerProduct")
        w, b = blobs[0], blobs[1]
        if w.ndim > 2:
            w = w.reshape(w.shape[-2], w.shape[-1])
        params[f"fc{i}_weights"] = jnp.asarray(w.T)
        params[f"fc{i}_biases"] = jnp.asarray(b.reshape(-1))
        if i < 4:
            _, slopes = None, layers[f"relu{i}"][1]
            params[f"prelu{i}_slopes"] = jnp.asarray(slopes[0].reshape(-1))
    return params


def convert_caffemodel_to_npz(path_to_caffemodel: str, path_to_npz: str,
                              width_target: int = 4) -> None:
    """Converts the shipped caffemodel to the npz layout (no pycaffe)."""
    params = import_caffemodel(path_to_caffemodel)
    np.savez(path_to_npz, **{k: np.asarray(v) for k, v in params.items()})
