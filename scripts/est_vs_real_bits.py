"""Estimator calibration probe: committed-tree estimated bits vs packed bits.

Runs serialize_hm_slice with a dual encoder: the real arithmetic coder and a
shadow BitCounter (same context-transition rules, fractional entropy-table
costs) fed the identical bin sequence.  If the RDO estimator is calibrated,
the shadow total matches the packed CABAC payload closely.
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

from context_adaptive_neural_network_based_prediction_tpu.codec import (
    cabac, encoder, hm_encoder, rdo)


class DualEncoder:
    def __init__(self):
        self.real = cabac.CabacEncoder()
        self.counter = rdo.BitCounter()
        self.shadow_ctx = None

    def _shadow(self, ctx):
        if self.shadow_ctx is None:
            self.shadow_ctx = ctx.copy()
        return self.shadow_ctx

    def encode_bin(self, v, ctx, idx):
        self.counter.encode_bin(v, self._shadow(ctx), idx)
        self.real.encode_bin(v, ctx, idx)

    def encode_bin_ep(self, v):
        self.counter.encode_bin_ep(v)
        self.real.encode_bin_ep(v)

    def encode_bins_ep(self, v, n):
        self.counter.encode_bins_ep(v, n)
        self.real.encode_bins_ep(v, n)

    def encode_bin_trm(self, v):
        self.counter.encode_bin_trm(v)
        self.real.encode_bin_trm(v)

    def terminate_and_finish(self):
        return self.real.terminate_and_finish()


def main():
    src = np.load("/root/repo/tests/golden_hm/128_full_q32_src.npy")
    fe = encoder.FrameEncoder(src, 32)
    res = fe.encode()

    dual = DualEncoder()
    orig_cls = cabac.CabacEncoder
    cabac.CabacEncoder = lambda: dual
    try:
        payload = hm_encoder.serialize_hm_slice(
            res.ctu_trees, width=fe.w, height=fe.h, qp=32,
            policy="regular", ctu_size=fe.ctu, sign_hiding=fe.sign_hiding,
            max_tu_depth=fe.max_tu_depth, sao_grid=fe._sao_grid,
            transform_skip=fe.transform_skip)
    finally:
        cabac.CabacEncoder = orig_cls
    est = dual.counter.frac_bits
    real = len(payload) * 8
    print(f"estimated (shadow BitCounter): {est:.1f} bits")
    print(f"packed payload:                {real} bits "
          f"(incl. terminate+align, ~10 bit tail)")
    print(f"ratio est/real: {est / real:.4f}")


if __name__ == "__main__":
    main()
