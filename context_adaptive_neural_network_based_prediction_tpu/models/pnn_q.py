"""Quantized normative PNN inference: the codec's deterministic NN path.

Why this exists: float matmuls/convs are not reduction-order invariant — the
same context run at batch 31 inside the wavefront encoder and at batch 1 in a
sequential decoder differs by ~1e-6, which flips the normative
round(clip(pred + mean)) often enough to corrupt reconstruction at frame
scale (measured: 2e-6 max diff on CPU between batch-N and batch-1 forwards).
The reference never faces this because its encoder and decoder run the SAME
TF session one block at a time (`TComPrediction.cpp:556-637`); a TPU-native
codec that batches NN forwards across a whole wavefront step cannot.

The fix is to define the codec's normative forward in pure integer
arithmetic:

* weights  : per-output-channel scales, integer range chosen per layer by an
             overflow budget (up to +/-511; stored int16 for XLA);
* activations: int16, per-layer static ranges (up to +/-2047) calibrated
             offline and FROZEN with the weights (the quantized net is the
             normative artifact, like the reference's frozen graphs,
             `freezing_graph_pnn.py`);
* accumulation: int32 via `lax.dot_general`/`conv_general_dilated` with
             `preferred_element_type=int32` — integer sums are associative,
             hence bit-exact for ANY batching, fusion, or platform;
* requantization: elementwise float32 (int32->f32 cast, LeakyReLU, scale,
             round, clamp) — elementwise ops are deterministic everywhere.

Overflow is excluded by a hard per-layer budget: every contraction of length
K satisfies act_max * w_max * K <= 2^30, leaving another 2^30 of int32
headroom for the bias — guaranteed for adversarial inputs, not just typical
ones (a decoder's inputs come from attacker-controlled bitstreams).

This is also the TPU-first performance choice: int8/int16 multiply-
accumulate is MXU-native (measured ~20 int-TOPS on this chip for the FC
shapes vs ~5 f32-TFLOPs).

The float path (`models/pnn.py`) remains the research stack (training,
checkpoint-parity with the reference's shipped TF weights); `quantize_pnn`
converts a float model + calibration contexts into the frozen normative form.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from . import pnn

ACT_CAP = 2047          # max activation magnitude (int16 payload)
W_CAP = 511             # max weight magnitude
BUDGET = 1 << 30        # per-contraction int32 budget (bias gets the rest)
CALIB_MARGIN = 1.10     # headroom over calibration max activations


def _layer_budget(k: int) -> Tuple[int, int]:
    """(act_max, w_max) for a contraction of length k: act*w*k <= BUDGET."""
    prod_cap = max(BUDGET // max(k, 1), 8)
    act = min(ACT_CAP, int((4.0 * prod_cap) ** 0.5))
    w = min(W_CAP, max(prod_cap // act, 1))
    return act, w


# ----------------------------------------------------------- quantization --

def _wq_per_out(w: np.ndarray, out_axis: int, w_max: int):
    """Per-output-channel weight quantization -> (int16 weights, f32 scales)."""
    w = np.asarray(w, np.float32)
    red = tuple(i for i in range(w.ndim) if i != out_axis)
    amax = np.maximum(np.abs(w).max(axis=red), 1e-12)
    scale = amax / w_max
    shape = [1] * w.ndim
    shape[out_axis] = -1
    q = np.clip(np.round(w / scale.reshape(shape)), -w_max, w_max)
    return q.astype(np.int16), scale.astype(np.float32)


def _act_scale(calib_max: float, act_max: int) -> float:
    return float(max(calib_max, 1e-6) * CALIB_MARGIN / act_max)


def _bq(b: np.ndarray, scale) -> np.ndarray:
    """Bias -> int32 with the 2^30 headroom guarantee CHECKED at freeze time.

    The module's overflow argument (contraction <= 2^30, bias gets the other
    2^30 of int32 range) requires |bias_q| <= BUDGET.  A pathological
    calibration set (near-zero activation maxima -> tiny scales) would
    otherwise silently wrap int32 and freeze a corrupt "normative" model.
    """
    q = np.round(np.asarray(b, np.float32) / scale)
    amax = float(np.abs(q).max()) if q.size else 0.0
    if amax > BUDGET:
        raise ValueError(
            f"quantized bias magnitude {amax:.3g} exceeds the int32 headroom "
            f"budget {BUDGET}; calibration activation scales are degenerate")
    return q.astype(np.int32)


def quantize_pnn(params: dict, inputs_calib, width: int,
                 is_fully_connected: bool) -> dict:
    """Float params + calibration inputs -> frozen quantized param dict.

    `inputs_calib` has the `pnn.forward` input convention (flattened contexts
    for FC, (above, left) portion pair for conv).  Per-layer activation
    scales come from the float forward's intermediate maxima on this set;
    the result is a plain nested dict of numpy arrays (np.savez-able).
    """
    import jax.numpy as jnp

    if is_fully_connected:
        fp = params["fully_connected"]
        x = jnp.asarray(inputs_calib, jnp.float32)
        maxima = [float(np.abs(np.asarray(x)).max())]
        acts = x
        for i in range(3):
            acts = pnn.leaky_relu(
                jnp.dot(acts, fp[f"weights_{i}"]) + fp[f"biases_{i}"])
            maxima.append(float(np.abs(np.asarray(acts)).max()))
        dims_k = [5 * width * width] + [pnn.HIDDEN_FC] * 3
        q = {"kind": "fc", "width": np.int32(width)}
        a0, _ = _layer_budget(dims_k[0])
        s_prev = _act_scale(maxima[0], a0)
        q["in_scale"] = np.float32(s_prev)
        q["in_cap"] = np.int32(a0)
        for i in range(4):
            _, w_max = _layer_budget(dims_k[i])
            wq, sw = _wq_per_out(fp[f"weights_{i}"], 1, w_max)
            b = np.asarray(fp[f"biases_{i}"], np.float32)
            q[f"w_{i}"] = wq
            q[f"b_{i}"] = _bq(b, s_prev * sw)
            if i < 3:
                a_next, _ = _layer_budget(dims_k[i + 1])
                s_next = _act_scale(maxima[i + 1], a_next)
                q[f"m_{i}"] = (s_prev * sw / s_next).astype(np.float32)
                q[f"c_{i}"] = np.int32(a_next)
                s_prev = s_next
            else:
                q[f"m_{i}"] = (s_prev * sw).astype(np.float32)
        return q

    cp = params["convolutional"]
    above, left = inputs_calib
    strides = pnn.STRIDES_BRANCH[width]
    maps_per_layer = pnn._branch_layer_maps(strides)
    q = {"kind": "conv", "width": np.int32(width),
         "strides": np.asarray(strides, np.int32)}
    in_max = max(float(np.abs(np.asarray(above)).max()),
                 float(np.abs(np.asarray(left)).max()))

    # Contraction lengths per consumer layer.
    k_branch = []
    c_in = 1
    for i, s in enumerate(strides):
        k_branch.append((2 * s + 1) ** 2 * c_in)
        c_in = maps_per_layer[i]
    prod = int(np.prod(strides))
    w_out_ch = width // prod
    h0, w0 = width // prod, 3 * width // prod
    h1, w1 = 2 * width // prod, width // prod
    k_merger = h0 * w0 + h1 * w1
    strides_merger = strides[::-1]
    k_tconv = []
    c_in = maps_per_layer[-1]
    for i, s in enumerate(strides_merger):
        k_tconv.append((2 * s + 1) ** 2 * c_in)
        c_in = 1 if i == len(strides_merger) - 1 else c_in // s

    a_in, _ = _layer_budget(k_branch[0])
    s_in = _act_scale(in_max, a_in)
    q["in_scale"] = np.float32(s_in)
    q["in_cap"] = np.int32(a_in)

    # Trace the float forward to collect per-layer activation maxima.
    branch_scale = {}
    branch_outs = {}
    for bname, xin in (("branch_above", above), ("branch_left", left)):
        x = jnp.asarray(xin, jnp.float32)
        s_prev = s_in
        for i, s in enumerate(strides):
            layer = cp[bname][f"convolution_{i}"]
            x = pnn.leaky_relu(
                pnn.conv2d_same(x, layer["weights"], s) + layer["biases"])
            last = i == len(strides) - 1
            a_next, _ = _layer_budget(k_merger if last else k_branch[i + 1])
            s_next = _act_scale(float(np.abs(np.asarray(x)).max()), a_next)
            _, w_max = _layer_budget(k_branch[i])
            wq, sw = _wq_per_out(np.asarray(layer["weights"]), 3, w_max)
            b = np.asarray(layer["biases"], np.float32)
            q[f"{bname}/w_{i}"] = wq
            q[f"{bname}/b_{i}"] = _bq(b, s_prev * sw)
            q[f"{bname}/m_{i}"] = (s_prev * sw / s_next).astype(np.float32)
            q[f"{bname}/c_{i}"] = np.int32(a_next)
            s_prev = s_next
        branch_scale[bname] = s_prev
        branch_outs[bname] = x

    # Channelwise merger: per-map FC.  Branch activations arrive at two
    # different scales; requantize the left branch to the above branch's
    # scale first (elementwise, deterministic).
    s_merge_in = branch_scale["branch_above"]
    q["left_rescale"] = np.float32(branch_scale["branch_left"] / s_merge_in)
    q["merge_cap"] = q["branch_above/c_%d" % (len(strides) - 1)]
    merger = cp["merger"]
    cm = merger["channelwise_fully_connected_merger"]
    x = pnn.leaky_relu(pnn.channelwise_fc_merger(
        jnp.asarray(cm["weights"]), jnp.asarray(cm["biases"]),
        branch_outs["branch_above"], branch_outs["branch_left"],
        w_out_ch, w_out_ch))
    a_next, _ = _layer_budget(k_tconv[0])
    s_next = _act_scale(float(np.abs(np.asarray(x)).max()), a_next)
    _, w_max = _layer_budget(k_merger)
    wq, sw = _wq_per_out(np.asarray(cm["weights"]), 0, w_max)   # per map
    q["merger/w"] = wq
    q["merger/b"] = _bq(cm["biases"], s_merge_in * sw[:, None])
    q["merger/m"] = (s_merge_in * sw / s_next).astype(np.float32)
    q["merger/c"] = np.int32(a_next)
    s_prev = s_next

    for i, s in enumerate(strides_merger):
        layer = merger[f"transpose_convolution_{i}"]
        last = i == len(strides_merger) - 1
        x = pnn.conv2d_transpose_same(x, jnp.asarray(layer["weights"]), s) \
            + layer["biases"]
        if not last:
            x = pnn.leaky_relu(x)
        _, w_max = _layer_budget(k_tconv[i])
        # TF layout (k, k, out, in): out axis 2.
        wq, sw = _wq_per_out(np.asarray(layer["weights"]), 2, w_max)
        b = np.asarray(layer["biases"], np.float32)
        q[f"merger/t_w_{i}"] = wq
        q[f"merger/t_b_{i}"] = _bq(b, s_prev * sw)
        if not last:
            a_next, _ = _layer_budget(k_tconv[i + 1])
            s_next = _act_scale(float(np.abs(np.asarray(x)).max()), a_next)
            q[f"merger/t_m_{i}"] = (s_prev * sw / s_next).astype(np.float32)
            q[f"merger/t_c_{i}"] = np.int32(a_next)
            s_prev = s_next
        else:
            q[f"merger/t_m_{i}"] = (s_prev * sw).astype(np.float32)
    return q


# -------------------------------------------------------- integer forward --

def _use_pallas_merger() -> bool:
    """Pallas merger kernel gate: opt-in via CANP_PALLAS=1 on TPU.

    Measured on this chip (artifacts/merger_int_profile.json): 0.84-1.04x
    the XLA int dot at codec shapes - both run at the ~270us dispatch floor,
    so the swap buys nothing yet.  The kernel stays (bit-identical, parity-
    tested) as the integer-kernel foundation, but XLA remains the default.
    """
    import os

    import jax

    if os.environ.get("CANP_PALLAS") != "1":
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _requant(acc_i32, mult, cap, leaky: bool):
    """int32 accumulator -> int16 activation (elementwise-deterministic)."""
    import jax.numpy as jnp

    x = acc_i32.astype(jnp.float32)
    if leaky:
        x = jnp.maximum(pnn.LEAKY_SLOPE * x, x)
    cap = jnp.float32(cap)
    return jnp.clip(jnp.round(x * mult), -cap, cap).astype(jnp.int16)


def _quant_in(x_f32, in_scale, cap):
    import jax.numpy as jnp

    cap = jnp.float32(cap)
    return jnp.clip(jnp.round(x_f32 / in_scale),
                    -cap, cap).astype(jnp.int16)


def _conv_q(x_i16, w_i16, stride: int):
    """Integer conv, TF-SAME padding, exact int32 accumulation."""
    import jax
    import jax.numpy as jnp

    k = w_i16.shape[0]
    pads = [pnn._tf_same_pads(x_i16.shape[1], stride, k),
            pnn._tf_same_pads(x_i16.shape[2], stride, k)]
    return jax.lax.conv_general_dilated(
        x_i16, w_i16, window_strides=(stride, stride), padding=pads,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)


def _conv_transpose_q(y_i16, w_i16_hwoi, stride: int):
    """Integer transpose conv == exact adjoint of `_conv_q` (TF semantics).

    Implemented directly as an input-dilated convolution with the flipped
    kernel — the closed form of the strided-SAME conv's vjp — because
    `jax.vjp` is undefined for integer primals.  Verified element-exact
    against `pnn.conv2d_transpose_same` on integer-valued floats.
    """
    import jax
    import jax.numpy as jnp

    k = w_i16_hwoi.shape[0]
    out_h = y_i16.shape[1] * stride
    out_w = y_i16.shape[2] * stride
    pads = []
    for size in (out_h, out_w):
        lo, hi = pnn._tf_same_pads(size, stride, k)
        # vjp padding of conv(pad lo/hi, stride s): (k-1-lo, k-1-hi+extra)
        # where extra covers input positions past the last window start.
        extra = (size + lo + hi - k) % stride
        pads.append((k - 1 - lo, k - 1 - hi + extra))
    w_flip = jnp.flip(w_i16_hwoi, axis=(0, 1))       # (k,k,out,in)
    w_t = jnp.swapaxes(w_flip, 2, 3)                  # -> (k,k,in,out): HWIO
    return jax.lax.conv_general_dilated(
        y_i16, w_t, window_strides=(1, 1), padding=pads,
        lhs_dilation=(stride, stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)


def forward_q(q: dict, inputs, width: int, is_fully_connected: bool):
    """Deterministic quantized forward; same I/O convention as `pnn.forward`.

    Inputs are the usual mean-subtracted float32 contexts; output is
    (N, w, w, 1) float32 prediction in mean-subtracted space.  Every step is
    either an exact integer contraction or an elementwise float op, so the
    result is bit-identical for any batch size, vmap nesting, fusion
    context, or backend.
    """
    import jax
    import jax.numpy as jnp

    if is_fully_connected:
        x = _quant_in(jnp.asarray(inputs, jnp.float32), q["in_scale"],
                      q["in_cap"])
        for i in range(4):
            acc = jax.lax.dot_general(
                x, jnp.asarray(q[f"w_{i}"]),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32) + jnp.asarray(q[f"b_{i}"])
            if i < 3:
                x = _requant(acc, jnp.asarray(q[f"m_{i}"]), q[f"c_{i}"],
                             leaky=True)
            else:
                out = acc.astype(jnp.float32) * jnp.asarray(q[f"m_{i}"])
        n = out.shape[0]
        return out.reshape(n, width, width, 1)

    above, left = inputs
    strides = [int(s) for s in np.asarray(q["strides"])]
    outs = {}
    for bname, xin in (("branch_above", above), ("branch_left", left)):
        x = _quant_in(jnp.asarray(xin, jnp.float32), q["in_scale"],
                      q["in_cap"])
        for i, s in enumerate(strides):
            acc = _conv_q(x, jnp.asarray(q[f"{bname}/w_{i}"]), s) \
                + jnp.asarray(q[f"{bname}/b_{i}"])
            x = _requant(acc, jnp.asarray(q[f"{bname}/m_{i}"]),
                         q[f"{bname}/c_{i}"], leaky=True)
        outs[bname] = x
    x0 = outs["branch_above"]
    # Rescale the left branch onto the above branch's activation scale.
    x1f = outs["branch_left"].astype(jnp.float32) * jnp.asarray(
        q["left_rescale"])
    cap = jnp.float32(q["merge_cap"])
    x1 = jnp.clip(jnp.round(x1f), -cap, cap).astype(jnp.int16)

    n = x0.shape[0]
    m = x0.shape[3]
    f0 = x0.reshape(n, -1, m)
    f1 = x1.reshape(n, -1, m)
    xc = jnp.concatenate([f0, f1], axis=1)            # (N, P, M) int16
    if _use_pallas_merger():
        # Vector-unit Pallas kernel at codec shapes; bit-identical to the
        # XLA dot by integer-sum associativity (ops/pallas/merger_int.py),
        # so normative streams are unaffected by the swap.
        from ..ops.pallas import merger_int

        acc = merger_int.merger_int_forward(
            xc, jnp.asarray(q["merger/w"]), jnp.asarray(q["merger/b"]))
    else:
        acc = jax.lax.dot_general(
            xc.transpose(2, 0, 1), jnp.asarray(q["merger/w"]),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)         # (M, N, O)
        acc = acc + jnp.asarray(q["merger/b"])[:, None, :]
    x = _requant(acc, jnp.asarray(q["merger/m"])[:, None, None],
                 q["merger/c"], leaky=True)
    prod = int(np.prod(strides))
    w_out_ch = width // prod
    x = x.transpose(1, 2, 0).reshape(n, w_out_ch, w_out_ch, m)

    strides_merger = strides[::-1]
    for i, s in enumerate(strides_merger):
        last = i == len(strides_merger) - 1
        acc = _conv_transpose_q(x, jnp.asarray(q[f"merger/t_w_{i}"]), s) \
            + jnp.asarray(q[f"merger/t_b_{i}"])
        if not last:
            x = _requant(acc, jnp.asarray(q[f"merger/t_m_{i}"]),
                         q[f"merger/t_c_{i}"], leaky=True)
        else:
            out = acc.astype(jnp.float32) * jnp.asarray(q[f"merger/t_m_{i}"])
    return out


def predict_pixels_q(q: dict, inputs, width: int, is_fully_connected: bool,
                     mean_training: float):
    """Normative pixel prediction: forward + mean + clip + round -> int32.

    The complete deterministic chain the codec uses on BOTH the batched
    device encoder and any sequential decoder (`TComPrediction.cpp:621-637`
    post-processing semantics)."""
    import jax.numpy as jnp

    pred = forward_q(q, inputs, width, is_fully_connected)[..., 0]
    return jnp.round(jnp.clip(pred + mean_training, 0.0, 255.0)
                     ).astype(jnp.int32)


# ------------------------------------------------------------- save/load --

def save_quantized(path: str, q: dict) -> None:
    np.savez_compressed(path, **{k: np.asarray(v) for k, v in q.items()})


def load_quantized(path: str) -> dict:
    with np.load(path) as data:
        out = {}
        for k in data.files:
            v = data[k]
            out[k] = v.item() if k == "kind" else v
        return out


# ----------------------------------------------------------- calibration --

def calibration_contexts(width: int, is_fully_connected: bool,
                         images=None, n_samples: int = 512,
                         seed: int = 0):
    """Calibration inputs from natural luma images (fallback: synthetic).

    Returns the `pnn.forward` input convention.  Masked variants are mixed
    in (the codec feeds zero-masked strips), so activation maxima cover the
    masked regime too.
    """
    rng = np.random.default_rng(seed)
    w = width
    above = np.zeros((n_samples, w, 3 * w), np.float32)
    left = np.zeros((n_samples, 2 * w, w), np.float32)
    if images is None:
        for i in range(n_samples):
            base = rng.uniform(0, 255)
            grad = rng.normal(0, 2.0, 2)
            noise = rng.normal(0, rng.uniform(1, 25))
            yy, xx = np.mgrid[0:2 * w, 0:3 * w]
            patch = base + grad[0] * yy + grad[1] * xx \
                + noise * rng.standard_normal((2 * w, 3 * w))
            patch = np.clip(patch, 0, 255) - 128.0
            above[i] = patch[:w, :]
            left[i] = patch[:, :w]
    else:
        mean = 128.0
        for i in range(n_samples):
            img = images[rng.integers(len(images))]
            h_img, w_img = img.shape
            y = rng.integers(w, h_img - 2 * w)
            x = rng.integers(w, w_img - 2 * w)
            above[i] = img[y - w:y, x - w:x + 2 * w].astype(np.float32) - mean
            left[i] = img[y:y + 2 * w, x - w:x].astype(np.float32) - mean
    # Random strip masking (codec regime).
    n_units = (2 * w) // 4
    for i in range(n_samples):
        if rng.random() < 0.5:
            ka = rng.integers(0, n_units + 1)
            kl = rng.integers(0, n_units + 1)
            if ka:
                above[i, :, 3 * w - 4 * ka:] = 0.0
            if kl:
                left[i, 2 * w - 4 * kl:, :] = 0.0
    if is_fully_connected:
        return np.concatenate(
            [above.reshape(n_samples, -1), left.reshape(n_samples, -1)],
            axis=1)
    return above[..., None], left[..., None]
