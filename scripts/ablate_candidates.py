"""Candidate-width ablation now that the bit estimator is calibrated."""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

from context_adaptive_neural_network_based_prediction_tpu.codec import (
    hm_encoder, rdo)
from context_adaptive_neural_network_based_prediction_tpu.evaluation import (
    hm_driver)
from context_adaptive_neural_network_based_prediction_tpu.utils import metrics

HM_POINTS = {32: (0.50277, 35.432), 42: (0.14735, 28.214)}


def main():
    frame = hm_driver.load_luminance(
        "/root/reference/hevc/pseudo_data/rgb_library.jpg")[:384, :384]
    npix = frame.size
    for qp in (42, 32):
        rate_hm, psnr_hm = HM_POINTS[qp]
        bits_hm = rate_hm * npix
        mse_hm = 255.0 ** 2 / (10 ** (psnr_hm / 10))
        cost_hm = mse_hm * npix + rdo.lambda_for_qp(qp) * bits_hm
        print(f"\nQP{qp}  HM cost {cost_hm/1e6:.4f}M")
        for name, cand in [
            ("HM counts 8/8/3/3/3", None),
            ("large8  8/8/8/8/8", {16: 8, 32: 8, 64: 8}),
            ("exhaustive 35", {4: 35, 8: 35, 16: 35, 32: 35, 64: 35}),
        ]:
            import time
            t0 = time.time()
            stream, res = hm_encoder.encode_frame_hm(frame, qp,
                                                     rd_candidates=cand)
            dt = time.time() - t0
            bits = len(stream) * 8
            psnr = float(metrics.compute_psnr(frame, res.reconstruction))
            sse = float(((frame.astype(np.int64)
                          - res.reconstruction.astype(np.int64)) ** 2).sum())
            cost = sse + rdo.lambda_for_qp(qp) * bits
            print(f"  {name:22s} {bits:6d} bits {psnr:.3f} dB "
                  f"cost {cost/1e6:.4f}M (vs HM {100*(cost/cost_hm-1):+.2f}%) "
                  f"[{dt:.0f}s]", flush=True)


if __name__ == "__main__":
    main()
