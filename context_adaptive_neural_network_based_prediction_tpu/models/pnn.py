"""The PNN model family: context -> block prediction networks, in pure JAX.

Architecture parity with the reference (`pnn/components.py:10-368`,
`pnn/tfutils.py:8-462`, `pnn/PredictionNeuralNetwork.py:119-140`):

* **Fully-connected PNN** (target widths 4/8): 5w^2 -> 1200 -> 1200 -> 1200 ->
  w^2; LeakyReLU(0.1) on the first three layers, linear last; pixel-facing
  layers initialized N(0, 0.01), middle layers N(0, 0.029).
* **Convolutional PNN** (widths 4..64, used for 16/32/64): two convolutional
  branches (above context w x 3w, left context 2w x w); per-width stride
  tuples {4:(1,1), 8:(2,1), 16:(2,1,2,1), 32:(2,2,1,2,1), 64:(2,2,2,2,1)};
  each conv layer has kernel width 2*stride+1 and 32*prod(strides so far)
  output maps; the branches merge through a *channelwise fully-connected
  merger* (an independent FC per feature map from the concatenated spatial
  positions of both branches - a batched per-map matmul, ideal for the MXU);
  then a mirrored transpose-convolution stack (strides reversed, kernels
  2*stride+1, maps halving at stride-2 layers, final linear layer to 1 map).

Params are plain nested dicts whose keys mirror the reference's TF variable
scopes, so shipped TF checkpoints import 1:1 (`models/importer.py`).
Convolutions use explicit TF-"SAME" padding; transpose convolutions are the
exact linear transpose of the forward convolution (computed via `jax.vjp`),
which is TF's `conv2d_transpose` definition - this makes imported weights
reproduce the reference outputs to float tolerance.
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

LEAKY_SLOPE = 0.1
HIDDEN_FC = 1200
BRANCH_BASE_MAPS = 32
# Per-width convolutional branch strides (pnn/PredictionNeuralNetwork.py:126-133).
STRIDES_BRANCH: Dict[int, Tuple[int, ...]] = {
    4: (1, 1),
    8: (2, 1),
    16: (2, 1, 2, 1),
    32: (2, 2, 1, 2, 1),
    64: (2, 2, 2, 2, 1),
}


def leaky_relu(x):
    return jnp.maximum(LEAKY_SLOPE * x, x)


# ------------------------------------------------------------------ conv ----

def _tf_same_pads(in_size: int, stride: int, kernel: int) -> Tuple[int, int]:
    """TF 'SAME' padding (beg, end) for one spatial dim."""
    out_size = -(-in_size // stride)
    pad_total = max((out_size - 1) * stride + kernel - in_size, 0)
    beg = pad_total // 2
    return beg, pad_total - beg


def conv2d_same(x, weights_hwio, stride: int):
    """NHWC conv with TF-SAME padding; weights are (k, k, in, out) like TF."""
    k = weights_hwio.shape[0]
    pads = [_tf_same_pads(x.shape[1], stride, k), _tf_same_pads(x.shape[2], stride, k)]
    return jax.lax.conv_general_dilated(
        x, weights_hwio,
        window_strides=(stride, stride),
        padding=pads,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )


def conv2d_transpose_same(y, weights_hwoi, stride: int):
    """TF `conv2d_transpose` with SAME padding: the exact linear transpose of
    `conv2d_same`.  `weights_hwoi` is (k, k, out, in) like TF; output spatial
    dims are input * stride.
    """
    n, h, w, _c_in = y.shape
    c_out = weights_hwoi.shape[2]
    out_shape = (n, h * stride, w * stride, c_out)
    primal = jnp.zeros(out_shape, y.dtype)
    _, vjp = jax.vjp(lambda x: conv2d_same(x, weights_hwoi, stride), primal)
    return vjp(y)[0]


# ------------------------------------------------------------ FC network ----

def init_fc_params(key, width_target: int) -> dict:
    """Initializes the fully-connected PNN (reference init distributions)."""
    w2 = width_target ** 2
    keys = jax.random.split(key, 4)
    dims = [(5 * w2, HIDDEN_FC), (HIDDEN_FC, HIDDEN_FC), (HIDDEN_FC, HIDDEN_FC), (HIDDEN_FC, w2)]
    stddevs = [0.01, 0.029, 0.029, 0.01]
    params = {}
    for i, ((d_in, d_out), sd) in enumerate(zip(dims, stddevs)):
        params[f"weights_{i}"] = sd * jax.random.normal(keys[i], (d_in, d_out), jnp.float32)
        params[f"biases_{i}"] = jnp.zeros((d_out,), jnp.float32)
    return params


def fc_forward(params: dict, flattened_contexts: jnp.ndarray, width_target: int):
    """FC PNN forward: (N, 5w^2) float32 -> (N, w, w, 1) float32."""
    x = flattened_contexts
    for i in range(3):
        x = leaky_relu(jnp.dot(x, params[f"weights_{i}"],
                               preferred_element_type=jnp.float32) + params[f"biases_{i}"])
    x = jnp.dot(x, params["weights_3"], preferred_element_type=jnp.float32) + params["biases_3"]
    n = x.shape[0]
    return x.reshape(n, width_target, width_target, 1)


# ---------------------------------------------------------- conv network ----

def _branch_layer_maps(strides: Tuple[int, ...]):
    maps, out = BRANCH_BASE_MAPS, []
    for s in strides:
        maps *= s
        out.append(maps)
    return out


def init_conv_params(key, width_target: int) -> dict:
    """Initializes the convolutional PNN for one target width."""
    strides = STRIDES_BRANCH[width_target]
    maps_per_layer = _branch_layer_maps(strides)
    params: dict = {}
    key_iter = iter(jax.random.split(key, 4 * len(strides) + 2))

    for branch in ("branch_above", "branch_left"):
        bp = {}
        c_in = 1
        for i, (s, c_out) in enumerate(zip(strides, maps_per_layer)):
            k = 2 * s + 1
            # Pixel-facing layer (i == 0) uses N(0, 0.01), else Xavier-like.
            sd = 0.01 if i == 0 else 1.0 / math.sqrt(c_in * k * k)
            bp[f"convolution_{i}"] = {
                "weights": sd * jax.random.normal(next(key_iter), (k, k, c_in, c_out), jnp.float32),
                "biases": jnp.zeros((c_out,), jnp.float32),
            }
            c_in = c_out
        params[branch] = bp

    # Branch output geometry.
    prod = int(np.prod(strides))
    h0, w0 = width_target // prod, 3 * width_target // prod     # above branch out
    h1, w1 = 2 * width_target // prod, width_target // prod     # left branch out
    maps = maps_per_layer[-1]
    n_in = h0 * w0 + h1 * w1
    w_out_ch = width_target // prod
    merger: dict = {
        "channelwise_fully_connected_merger": {
            "weights": (1.0 / math.sqrt(n_in)) * jax.random.normal(
                next(key_iter), (maps, n_in, w_out_ch * w_out_ch), jnp.float32),
            "biases": jnp.zeros((maps, w_out_ch * w_out_ch), jnp.float32),
        }
    }
    strides_merger = strides[::-1]
    c_in = maps
    for i, s in enumerate(strides_merger):
        k = 2 * s + 1
        last = i == len(strides_merger) - 1
        c_out = 1 if last else c_in // s
        sd = 0.01 if last else 1.0 / math.sqrt(c_in * k * k)
        # TF conv2d_transpose filters are (k, k, out, in).
        merger[f"transpose_convolution_{i}"] = {
            "weights": sd * jax.random.normal(next(key_iter), (k, k, c_out, c_in), jnp.float32),
            "biases": jnp.zeros((c_out,), jnp.float32),
        }
        c_in = c_out
    params["merger"] = merger
    return params


def _branch_forward(bp: dict, x, strides: Tuple[int, ...]):
    for i, s in enumerate(strides):
        layer = bp[f"convolution_{i}"]
        x = leaky_relu(conv2d_same(x, layer["weights"], s) + layer["biases"])
    return x


def channelwise_fc_merger(weights, biases, x0, x1, h_out: int, w_out: int):
    """Per-feature-map FC from both branches' spatial positions to the merged map.

    x0: (N, h0, w0, M), x1: (N, h1, w1, M); weights: (M, P, O) with
    P = h0*w0 + h1*w1, O = h_out*w_out; biases: (M, O).
    Batched per-map matmul -> a single MXU-friendly dot_general.
    """
    n, _, _, m = x0.shape
    f0 = x0.reshape(n, -1, m)
    f1 = x1.reshape(n, -1, m)
    xc = jnp.concatenate([f0, f1], axis=1)          # (N, P, M)
    # out[n, m, o] = sum_p xc[n, p, m] * weights[m, p, o]
    out = jax.lax.dot_general(
        xc.transpose(2, 0, 1), weights,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (M, N, O)
    out = out + biases[:, None, :]
    out = out.transpose(1, 2, 0)                    # (N, O, M)
    return out.reshape(n, h_out, w_out, m)


def conv_forward(params: dict, portions_above, portions_left, width_target: int):
    """Convolutional PNN forward: above (N,w,3w,1) + left (N,2w,w,1) -> (N,w,w,1)."""
    strides = STRIDES_BRANCH[width_target]
    x0 = _branch_forward(params["branch_above"], portions_above, strides)
    x1 = _branch_forward(params["branch_left"], portions_left, strides)
    prod = int(np.prod(strides))
    w_out_ch = width_target // prod
    merger = params["merger"]
    cm = merger["channelwise_fully_connected_merger"]
    x = leaky_relu(channelwise_fc_merger(cm["weights"], cm["biases"], x0, x1,
                                         w_out_ch, w_out_ch))
    strides_merger = strides[::-1]
    for i, s in enumerate(strides_merger):
        layer = merger[f"transpose_convolution_{i}"]
        x = conv2d_transpose_same(x, layer["weights"], s) + layer["biases"]
        if i != len(strides_merger) - 1:
            x = leaky_relu(x)
    return x


# ------------------------------------------------------------- dispatch ----

def init_params(key, width_target: int, is_fully_connected: bool) -> dict:
    if is_fully_connected:
        return {"fully_connected": init_fc_params(key, width_target)}
    return {"convolutional": init_conv_params(key, width_target)}


def forward(params: dict, inputs, width_target: int, is_fully_connected: bool):
    """Unified forward.  `inputs` is a flattened-context array for FC nets or a
    (portions_above, portions_left) tuple for conv nets.  Returns (N, w, w, 1).
    """
    if is_fully_connected:
        return fc_forward(params["fully_connected"], inputs, width_target)
    above, left = inputs
    return conv_forward(params["convolutional"], above, left, width_target)


def predict_uint8(params: dict, inputs, width_target: int, is_fully_connected: bool,
                  mean_training: float):
    """Inference to pixel space: forward + mean add + clip + round -> uint8.

    Matches the codec-side post-processing of the reference
    (`TComPrediction.cpp:621-637`: add mean, clip to [0,255], round).
    """
    pred = forward(params, inputs, width_target, is_fully_connected)
    pred = jnp.clip(pred[..., 0] + mean_training, 0.0, 255.0)
    return jnp.round(pred).astype(jnp.uint8)
