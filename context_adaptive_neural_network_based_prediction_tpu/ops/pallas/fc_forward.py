"""Pallas TPU kernel: fused fully-connected PNN forward.

The FC PNN (5w^2 -> 1200 -> 1200 -> 1200 -> w^2, LeakyReLU 0.1) is the
network the codec runs for every 4x4/8x8 TB.  Dispatched as four separate XLA
matmuls the op is launch- and HBM-bound at codec batch sizes; this kernel
fuses the whole chain into ONE `pallas_call` with every weight resident in
VMEM (bf16 storage, f32 accumulation on the MXU), so activations never leave
the chip.

VMEM budget (w=8): weights 320x1200 + 2x 1200x1200 + 1200x64 in bf16
= 6.7 MB, plus a (TILE_B, 1200) f32 activation buffer - comfortably inside
the ~16 MB/core budget (pallas_guide.md "Memory Hierarchy").

This is the serving fast path; the normative in-loop forward stays the f32
XLA path (`models/pnn.py`).  A CPU `interpret=True` twin keeps it testable
without TPU hardware.
"""

from __future__ import annotations

import functools

import numpy as np

TILE_B = 128
SLOPE = 0.1


def _round_up(x, m):
    return ((x + m - 1) // m) * m


@functools.lru_cache(maxsize=None)
def _build(width_target: int, interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    d_in = 5 * width_target ** 2
    d_out = width_target ** 2
    d_in_pad = _round_up(d_in, 128)
    d_out_pad = _round_up(d_out, 128)
    hidden = 1200
    hidden_pad = _round_up(hidden, 128)  # 1280

    def kernel(x_ref, w0_ref, b0_ref, w1_ref, b1_ref, w2_ref, b2_ref,
               w3_ref, b3_ref, out_ref):
        x = x_ref[:]                                     # (TILE_B, d_in_pad) f32
        h = jnp.dot(x, w0_ref[:].astype(jnp.float32),
                    preferred_element_type=jnp.float32) + b0_ref[:]
        h = jnp.maximum(SLOPE * h, h)
        h = jnp.dot(h, w1_ref[:].astype(jnp.float32),
                    preferred_element_type=jnp.float32) + b1_ref[:]
        h = jnp.maximum(SLOPE * h, h)
        h = jnp.dot(h, w2_ref[:].astype(jnp.float32),
                    preferred_element_type=jnp.float32) + b2_ref[:]
        h = jnp.maximum(SLOPE * h, h)
        out_ref[:] = jnp.dot(h, w3_ref[:].astype(jnp.float32),
                             preferred_element_type=jnp.float32) + b3_ref[:]

    @jax.jit
    def forward(x, w0, b0, w1, b1, w2, b2, w3, b3):
        b = x.shape[0]
        b_pad = _round_up(max(b, 8), TILE_B)
        xp = jnp.zeros((b_pad, d_in_pad), jnp.float32).at[:b, :d_in].set(x)

        def pad2(w, rows, cols):
            return jnp.zeros((rows, cols), jnp.bfloat16).at[
                :w.shape[0], :w.shape[1]].set(w.astype(jnp.bfloat16))

        def pad1(v, cols):
            return jnp.zeros((1, cols), jnp.float32).at[0, :v.shape[0]].set(v)

        args = (
            xp,
            pad2(w0, d_in_pad, hidden_pad), pad1(b0, hidden_pad),
            pad2(w1, hidden_pad, hidden_pad), pad1(b1, hidden_pad),
            pad2(w2, hidden_pad, hidden_pad), pad1(b2, hidden_pad),
            pad2(w3, hidden_pad, d_out_pad), pad1(b3, d_out_pad),
        )
        grid = (b_pad // TILE_B,)
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((TILE_B, d_in_pad), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((d_in_pad, hidden_pad), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, hidden_pad), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((hidden_pad, hidden_pad), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, hidden_pad), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((hidden_pad, hidden_pad), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, hidden_pad), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((hidden_pad, d_out_pad), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, d_out_pad), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TILE_B, d_out_pad), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b_pad, d_out_pad), jnp.float32),
            interpret=interpret,
        )(*args)
        return out[:b, :d_out]

    return forward


def fc_forward_pallas(params: dict, flattened_contexts, width_target: int,
                      *, interpret: bool | None = None):
    """Fused FC-PNN forward -> (N, w, w, 1) float32 (bf16 weight storage).

    `interpret=None` auto-selects: compiled on TPU backends, interpreter on
    CPU (tests).  Accuracy vs the f32 XLA path is bf16-level (~1e-2 rel); use
    for throughput serving, not for the normative codec loop.
    """
    import jax
    import jax.numpy as jnp

    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    fc = params.get("fully_connected", params)
    fwd = _build(width_target, bool(interpret))
    out = fwd(jnp.asarray(flattened_contexts, jnp.float32),
              fc["weights_0"], fc["biases_0"], fc["weights_1"], fc["biases_1"],
              fc["weights_2"], fc["biases_2"], fc["weights_3"], fc["biases_3"])
    n = out.shape[0]
    return out.reshape(n, width_target, width_target, 1)
