"""Pallas TPU kernel: integer channelwise-FC merger at CODEC shapes.

The quantized normative PNN (models/pnn_q.py) runs its channelwise merger
as an integer contraction out[m, n, o] = sum_p x[n, p, m] * w[m, p, o]
(per-feature-map FC, reference `pnn/tfutils.py:8-73`).  At the shapes the
WAVEFRONT ENCODER actually runs it — batch N = wavefront slots (~17..34),
P = 80 context positions, O = 16 outputs, M = 64..256 maps — an MXU
`dot_general` wastes >90% of every 128x128 systolic pass on padding (round-2
mfu_profile.json: the f32 Pallas merger lost to XLA for the same reason).

This kernel instead uses the VECTOR units with the map dimension on the
128-wide lane axis: for each output position o, accumulate
acc[n, m] += x[n, p, m] * w[p, o, m] over p — small-N-friendly, no padding
beyond the M tile.  Because every operation is an exact int32
multiply-accumulate, the result is BIT-IDENTICAL to the XLA integer dot
(integer sums are associative), so the kernel is a legal drop-in inside the
normative coding loop — swapping it cannot change a single decoded pixel.

`interpret=True` twin keeps it testable on CPU.
"""

from __future__ import annotations

import functools

import numpy as np

LANES = 128


def _round_up(x, m):
    return ((x + m - 1) // m) * m


@functools.lru_cache(maxsize=None)
def _build(n_in: int, p_in: int, o_out: int, m_maps: int, interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    m_pad = _round_up(m_maps, LANES)
    n_pad = _round_up(n_in, 8)

    def kernel(x_ref, w_ref, b_ref, out_ref):
        # x (n_pad, P, LANES), w (P, O, LANES), b (O, LANES) int32
        x = x_ref[...]
        w = w_ref[...]
        acc = jnp.broadcast_to(b_ref[...][None, :, :],
                               (n_pad, o_out, LANES)).astype(jnp.int32)
        for p in range(p_in):
            # Basic slices only (None-indexing lowers to >2D gathers, which
            # Mosaic rejects); (n,1,L) * (1,O,L) broadcasts on the VPU.
            acc = acc + x[:, p:p + 1, :] * w[p:p + 1, :, :]
        out_ref[...] = acc

    @jax.jit
    def run(x, w, b):
        """x (N, P, M) i32, w (P, O, M) i32, b (O, M) i32 -> (N, O, M) i32."""
        x = jnp.pad(x, ((0, n_pad - n_in), (0, 0), (0, m_pad - m_maps)))
        w = jnp.pad(w, ((0, 0), (0, 0), (0, m_pad - m_maps)))
        b = jnp.pad(b, ((0, 0), (0, m_pad - m_maps)))
        grid = (m_pad // LANES,)
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((n_pad, p_in, LANES), lambda i: (0, 0, i)),
                pl.BlockSpec((p_in, o_out, LANES), lambda i: (0, 0, i)),
                pl.BlockSpec((o_out, LANES), lambda i: (0, i)),
            ],
            out_specs=pl.BlockSpec((n_pad, o_out, LANES),
                                   lambda i: (0, 0, i)),
            out_shape=jax.ShapeDtypeStruct((n_pad, o_out, m_pad), jnp.int32),
            interpret=interpret,
        )(x, w, b)
        return out[:n_in, :, :m_maps]

    return run


def merger_int_forward(xc_i16, w_i16, b_i32, *, interpret: bool | None = None):
    """Integer merger contraction, bit-identical to the XLA dot path.

    xc_i16 (N, P, M) int16 activations, w_i16 (M, P, O) int16 weights (the
    pnn_q layout), b_i32 (M, O) int32 biases.  Returns (M, N, O) int32 accs
    in the pnn_q convention.
    """
    import jax
    import jax.numpy as jnp

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, p, m = xc_i16.shape
    o = w_i16.shape[2]
    run = _build(n, p, o, m, interpret)
    out = run(xc_i16.astype(jnp.int32),
              jnp.transpose(w_i16, (1, 2, 0)).astype(jnp.int32),
              jnp.transpose(b_i32, (1, 0)))
    return jnp.transpose(out, (2, 0, 1))       # (M, N, O)
