"""Per-CTU (bits, pre-filter SSE) comparison ours-vs-HM on the same frame.

Localizes the ~1% real-lambda-cost deficit: uniform across CTUs (systematic
estimator/lambda bias) or concentrated (specific structure/mode pattern).

Usage: per_ctu_cmp.py [qp]
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

from context_adaptive_neural_network_based_prediction_tpu.codec import (
    cabac, encoder, hm_decoder, hm_encoder, rdo)
from context_adaptive_neural_network_based_prediction_tpu.evaluation import \
    hm_driver
from scripts.forced_structure_probe import hm_encode

QP = int(sys.argv[1]) if len(sys.argv) > 1 else 32


def per_ctu(stream, frame, ctu=64):
    """Decode with bits attributed per CTU; returns (bits, sse_prefilter,
    depth histogram) arrays over the CTU grid plus the decoder."""
    d = hm_decoder.HmFrameDecoder(stream)
    gh = (d.h + ctu - 1) // ctu
    gw = (d.w + ctu - 1) // ctu
    bits = np.zeros((gh, gw))
    cur = [0, 0]

    orig_bin = cabac.CabacDecoder.decode_bin
    orig_ep = cabac.CabacDecoder.decode_bin_ep
    orig_eps = cabac.CabacDecoder.decode_bins_ep
    import math
    P_LPS = [0.5 * (0.949217 ** s) for s in range(64)]

    def bin_(self, ctx, idx):
        st = int(ctx[idx])
        v = orig_bin(self, ctx, idx)
        p = P_LPS[st >> 1] if v != (st & 1) else 1.0 - P_LPS[st >> 1]
        bits[cur[0], cur[1]] += -math.log2(max(p, 1e-12))
        return v

    def ep(self):
        bits[cur[0], cur[1]] += 1.0
        return orig_ep(self)

    def eps(self, n):
        bits[cur[0], cur[1]] += n
        return orig_eps(self, n)

    real_cu = hm_decoder.HmFrameDecoder._decode_cu

    def traced_cu(self, x, y, log2_size, depth):
        if (1 << log2_size) == ctu:
            cur[0], cur[1] = y // ctu, x // ctu
        return real_cu(self, x, y, log2_size, depth)

    cabac.CabacDecoder.decode_bin = bin_
    cabac.CabacDecoder.decode_bin_ep = ep
    cabac.CabacDecoder.decode_bins_ep = eps
    hm_decoder.HmFrameDecoder._decode_cu = traced_cu
    try:
        d.decode(use_native="never")
    finally:
        cabac.CabacDecoder.decode_bin = orig_bin
        cabac.CabacDecoder.decode_bin_ep = orig_ep
        cabac.CabacDecoder.decode_bins_ep = orig_eps
        hm_decoder.HmFrameDecoder._decode_cu = real_cu

    f64 = frame.astype(np.int64)
    sse = np.zeros((gh, gw))
    for gy in range(gh):
        for gx in range(gw):
            y0, x0 = gy * ctu, gx * ctu
            blk = d.recon[y0:y0 + ctu, x0:x0 + ctu]
            sse[gy, gx] = float(
                ((f64[y0:y0 + ctu, x0:x0 + ctu] - blk) ** 2).sum())
    return bits, sse, d


def main():
    frame = hm_driver.load_luminance(
        "/root/reference/hevc/pseudo_data/rgb_library.jpg")[:384, :384]
    lam = rdo.lambda_for_qp(QP)
    hm_stream, _ = hm_encode(frame, QP)
    fe = encoder.FrameEncoder(frame, QP)
    res = fe.encode()
    ours = hm_encoder.assemble_hm_stream(
        res, sao_enabled=fe.sao, deblocking=fe.deblocking,
        sign_hiding=fe.sign_hiding, transform_skip=fe.transform_skip,
        max_tu_depth=fe.max_tu_depth, sao_grid=fe._sao_grid,
        strong_intra_smoothing=fe.strong_smoothing, ctu_size=fe.ctu)

    b_hm, s_hm, d_hm = per_ctu(hm_stream, frame)
    b_us, s_us, d_us = per_ctu(ours, frame)
    dj = (s_us + lam * b_us) - (s_hm + lam * b_hm)
    order = np.argsort(dj.ravel())[::-1]
    gh, gw = dj.shape
    print(f"QP{QP}: total dJ {dj.sum():+.0f} over {gh*gw} CTUs; "
          f"mean {dj.mean():+.0f}, median {np.median(dj):+.0f}, "
          f"CTUs where we lose: {(dj > 0).sum()}")
    print("worst 8 CTUs (gy,gx, dJ, dbits, dsse, our-depth-hist, hm-depth-hist):")
    for idx in order[:8]:
        gy, gx = idx // gw, idx % gw
        uh = np.bincount(
            d_us.depth_map[gy*16:(gy+1)*16, gx*16:(gx+1)*16].ravel(),
            minlength=4)
        hh = np.bincount(
            d_hm.depth_map[gy*16:(gy+1)*16, gx*16:(gx+1)*16].ravel(),
            minlength=4)
        print(f"  ({gy},{gx}) dJ {dj[gy,gx]:+9.0f}  dbits "
              f"{b_us[gy,gx]-b_hm[gy,gx]:+7.1f}  dsse "
              f"{s_us[gy,gx]-s_hm[gy,gx]:+9.0f}  {list(uh)} vs {list(hh)}")


if __name__ == "__main__":
    main()
