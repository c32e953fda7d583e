"""Pallas TPU kernel: fused channelwise-FC merger (+ LeakyReLU).

The convolutional PNN's merger is an independent fully-connected layer per
feature map (reference `pnn/tfutils.py:8-73`): for each of the M maps,
out[n, :, m] = concat(above, left)[n, :, m] @ W[m] + b[m].  That is a
*batched per-map matmul* - exactly the MXU-friendly shape SURVEY.md §7
stage 3 names as a kernel target.  XLA lowers the equivalent `dot_general`
plus bias-add plus LeakyReLU as separate HLOs with an (M, N, O) round trip
through HBM; this kernel keeps each map's weight panel in VMEM, runs the
matmul on the MXU at f32 accumulation (bf16 weight storage), and applies
bias + LeakyReLU before the tile ever leaves the chip.

Grid: (M, ceil(N / TILE_B)).  Weight panels are (P_pad, O_pad) with P/O
padded to the 128-lane register width; zero padding is exact (extra rows
multiply zero activations).

Serving fast path only - the normative in-loop forward stays the f32 XLA
path (`models/pnn.py:channelwise_fc_merger`).  `interpret=True` twin keeps
it testable on CPU.
"""

from __future__ import annotations

import functools

import numpy as np

TILE_B = 128
SLOPE = 0.1


def _round_up(x, m):
    return ((x + m - 1) // m) * m


@functools.lru_cache(maxsize=None)
def _build(m_maps: int, p_in: int, o_out: int, apply_act: bool,
           interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    p_pad = _round_up(p_in, 128)
    o_pad = _round_up(o_out, 128)

    def kernel(x_ref, w_ref, b_ref, out_ref):
        x = x_ref[0]                                   # (TILE_B, p_pad) f32
        acc = jnp.dot(x, w_ref[0].astype(jnp.float32),
                      preferred_element_type=jnp.float32) + b_ref[0]
        if apply_act:
            acc = jnp.maximum(SLOPE * acc, acc)
        out_ref[0] = acc

    # Mosaic requires the last two block dims to be (8,128)-aligned or span
    # the whole array: biases ride as (M, 1, o_pad) so the (1, o_pad) tail
    # equals the array dims exactly.

    @jax.jit
    def run(xc, weights, biases):
        """xc (M, N, P) f32, weights (M, P, O) bf16/f32, biases (M, O)."""
        mm, n, _ = xc.shape
        n_pad = _round_up(n, TILE_B)
        xc = jnp.pad(xc, ((0, 0), (0, n_pad - n), (0, p_pad - p_in)))
        w = jnp.pad(weights, ((0, 0), (0, p_pad - p_in),
                              (0, o_pad - o_out))).astype(jnp.bfloat16)
        b = jnp.pad(biases, ((0, 0), (0, o_pad - o_out))).astype(
            jnp.float32)[:, None, :]
        grid = (mm, n_pad // TILE_B)
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, TILE_B, p_pad), lambda i, j: (i, j, 0)),
                pl.BlockSpec((1, p_pad, o_pad), lambda i, j: (i, 0, 0)),
                pl.BlockSpec((1, 1, o_pad), lambda i, j: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, TILE_B, o_pad), lambda i, j: (i, j, 0)),
            out_shape=jax.ShapeDtypeStruct((mm, n_pad, o_pad), jnp.float32),
            interpret=interpret,
        )(xc, w, b)
        return out[:, :n, :o_out]

    return run


def merger_forward(weights, biases, x0, x1, h_out: int, w_out: int, *,
                   apply_act: bool = True, interpret: bool | None = None):
    """Drop-in fused replacement for `pnn.channelwise_fc_merger` (+act).

    x0: (N, h0, w0, M) above-branch features; x1: (N, h1, w1, M) left-branch;
    weights (M, P, O), biases (M, O).  Returns (N, h_out, w_out, M) f32.
    """
    import jax
    import jax.numpy as jnp

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, _, _, m = x0.shape
    f0 = jnp.reshape(x0, (n, -1, m))
    f1 = jnp.reshape(x1, (n, -1, m))
    xc = jnp.concatenate([f0, f1], axis=1).transpose(2, 0, 1)   # (M, N, P)
    p_in = xc.shape[2]
    o_out = h_out * w_out
    run = _build(m, p_in, o_out, apply_act, interpret)
    out = run(xc.astype(jnp.float32), weights, biases)          # (M, N, O)
    return out.transpose(1, 2, 0).reshape(n, h_out, w_out, m)
