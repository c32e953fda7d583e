"""Per-syntax-category CABAC bit accounting: HM's stream vs ours.

Decodes two streams of the same source through the Python HmFrameDecoder with
the CABAC decoder instrumented to attribute exact fractional bits
(-log2 p(bin) for context bins, 1.0 for bypass) to the *caller* frame, giving
a per-syntax-category breakdown of where the rate goes.
"""

import collections
import inspect
import math
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

from context_adaptive_neural_network_based_prediction_tpu.codec import (
    cabac, hm_decoder)

# HM next-state tables live in cabac; p(LPS) per state from the standard.
# Exact fractional cost: use the CABAC range subdivision as HM's estimator
# does: cost = entropy of the bin under the context's current state.
_STATE_P_LPS = [0.5 * (0.949217 ** s) for s in range(64)]


def _bin_cost(state6, mps, bin_val):
    p_lps = _STATE_P_LPS[state6]
    p = p_lps if bin_val != mps else 1.0 - p_lps
    return -math.log2(max(p, 1e-12))


class Tally:
    def __init__(self):
        self.bits = collections.Counter()
        self.count = collections.Counter()

    def add(self, cost):
        f = inspect.currentframe().f_back.f_back
        # Walk out of cabac internals to the decoder method.
        while f and ("cabac.py" in f.f_code.co_filename
                     or f.f_code.co_name in ("wrapped",)):
            f = f.f_back
        name = f.f_code.co_name if f else "?"
        self.bits[name] += cost
        self.count[name] += 1


def instrument(tally):
    orig_bin = cabac.CabacDecoder.decode_bin
    orig_ep = cabac.CabacDecoder.decode_bin_ep
    orig_eps = cabac.CabacDecoder.decode_bins_ep
    orig_trm = cabac.CabacDecoder.decode_bin_trm

    def bin_(self, ctx, idx):
        st = int(ctx[idx])
        state6, mps = st >> 1, st & 1
        v = orig_bin(self, ctx, idx)
        tally.add(_bin_cost(state6, mps, v))
        return v

    def ep(self):
        v = orig_ep(self)
        tally.add(1.0)
        return v

    def eps(self, n):
        v = orig_eps(self, n)
        tally.add(float(n))
        return v

    def trm(self):
        v = orig_trm(self)
        # Fixed approximation for the terminate bin: true cost is
        # -log2(1 - 2/range) from the live decoder state, ~0.01-0.1 bits;
        # one trm fires per CTU so the total error is <1 bit/stream.
        tally.add(0.05)
        return v

    cabac.CabacDecoder.decode_bin = bin_
    cabac.CabacDecoder.decode_bin_ep = ep
    cabac.CabacDecoder.decode_bins_ep = eps
    cabac.CabacDecoder.decode_bin_trm = trm
    return (orig_bin, orig_ep, orig_eps, orig_trm)


def restore(origs):
    (cabac.CabacDecoder.decode_bin, cabac.CabacDecoder.decode_bin_ep,
     cabac.CabacDecoder.decode_bins_ep, cabac.CabacDecoder.decode_bin_trm) = origs


def account(stream_bytes, label):
    tally = Tally()
    origs = instrument(tally)
    try:
        res = hm_decoder.decode_hm_stream(stream_bytes, use_native="never")
    finally:
        restore(origs)
    total = sum(tally.bits.values())
    print(f"\n== {label}: {len(stream_bytes)} bytes, "
          f"{total:.0f} CABAC bits accounted ==")
    for name, bits in tally.bits.most_common():
        print(f"  {name:28s} {bits:10.1f} bits  ({tally.count[name]:6d} calls)")
    return res, tally


def main():
    src = np.load("/root/repo/tests/golden_hm/128_full_q32_src.npy")
    hm_stream = open("/root/repo/tests/golden_hm/128_full_q32.bin", "rb").read()

    from context_adaptive_neural_network_based_prediction_tpu.codec import (
        encoder, hm_encoder)

    kwargs = {}
    if len(sys.argv) > 1 and sys.argv[1] == "tuned":
        kwargs = dict(max_tu_depth=3, rd_candidates={16: 8, 32: 8, 64: 8})
    fe = encoder.FrameEncoder(src, 32, **kwargs)
    res = fe.encode()
    ours = hm_encoder.assemble_hm_stream(
        res, sao_enabled=fe.sao, deblocking=fe.deblocking,
        sign_hiding=fe.sign_hiding, transform_skip=fe.transform_skip,
        max_tu_depth=fe.max_tu_depth, sao_grid=fe._sao_grid,
        strong_intra_smoothing=fe.strong_smoothing, ctu_size=fe.ctu)

    hm_res, _ = account(hm_stream, "HM-16.15")
    our_res, _ = account(ours, "ours")
    hm_psnr = 10 * math.log10(255 ** 2 / max(
        np.mean((hm_res.reconstruction.astype(float) - src) ** 2), 1e-6))
    our_psnr = 10 * math.log10(255 ** 2 / max(
        np.mean((our_res.reconstruction.astype(float) - src) ** 2), 1e-6))
    print(f"\nPSNR: HM {hm_psnr:.3f} dB  ours {our_psnr:.3f} dB")
    print(f"bytes: HM {len(hm_stream)}  ours {len(ours)}")


if __name__ == "__main__":
    main()
