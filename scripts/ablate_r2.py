"""Ablation of the round-2 encoder changes at the BD-critical QPs.

Variants toggle: hm_speedup (no-split mode loop), tskip_fast, SAO merge
estimation.  Reports NAL-exact rate/PSNR and the lambda RD cost per variant
on the rgb_library 384x384 frame, next to HM's measured point.
"""

import functools
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

from context_adaptive_neural_network_based_prediction_tpu.codec import (
    hm_encoder, rdo, sao as sao_mod)
from context_adaptive_neural_network_based_prediction_tpu.evaluation import (
    hm_driver)
from context_adaptive_neural_network_based_prediction_tpu.utils import metrics

HM_POINTS = {32: (0.50277, 35.432), 42: (0.14735, 28.214)}


def run(frame, qp, *, speedup, tsf, merge):
    orig_est = sao_mod.estimate_frame
    if not merge:
        sao_mod.estimate_frame = functools.partial(orig_est, merge=False)
    try:
        stream, res = hm_encoder.encode_frame_hm(
            frame, qp, hm_speedup=speedup, tskip_fast=tsf)
    finally:
        sao_mod.estimate_frame = orig_est
    bits = len(stream) * 8
    psnr = float(metrics.compute_psnr(frame, res.reconstruction))
    sse = float(((frame.astype(np.int64)
                  - res.reconstruction.astype(np.int64)) ** 2).sum())
    cost = sse + rdo.lambda_for_qp(qp) * bits
    return bits, psnr, cost


def main():
    frame = hm_driver.load_luminance(
        "/root/reference/hevc/pseudo_data/rgb_library.jpg")[:384, :384]
    npix = frame.size
    for qp in (42, 32):
        rate_hm, psnr_hm = HM_POINTS[qp]
        bits_hm = rate_hm * npix
        mse_hm = 255.0 ** 2 / (10 ** (psnr_hm / 10))
        cost_hm = mse_hm * npix + rdo.lambda_for_qp(qp) * bits_hm
        print(f"\nQP{qp}  HM: {bits_hm:.0f} bits {psnr_hm:.3f} dB "
              f"cost {cost_hm/1e6:.4f}M")
        for name, kw in [
            ("A speedup+tsf+merge", dict(speedup=True, tsf=True, merge=True)),
            ("B fulltree+tsf+merge", dict(speedup=False, tsf=True, merge=True)),
            ("C speedup+ts_all+merge", dict(speedup=True, tsf=False, merge=True)),
            ("D speedup+tsf+nomerge", dict(speedup=True, tsf=True, merge=False)),
            ("E fulltree+ts_all+nomerge", dict(speedup=False, tsf=False,
                                               merge=False)),
        ]:
            bits, psnr, cost = run(frame, qp, **kw)
            print(f"  {name:26s} {bits:6d} bits {psnr:.3f} dB "
                  f"cost {cost/1e6:.4f}M  (vs HM {100*(cost/cost_hm-1):+.2f}%)",
                  flush=True)


if __name__ == "__main__":
    main()
