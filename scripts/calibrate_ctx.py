"""Calibrate the device rate model with EVOLVED CABAC context states.

The static rate model (parallel/rate_model.py) defaults to HM's context
-initialisation states, which can sit far from the steady-state probabilities
real content reaches (e.g. greater1 at init costs 3.7 bits for a 1 while a
mid-frame state costs ~1.5).  HM's own RDO avoids this by loading the live
contexts before every decision (TEncSbac loadIntraDirModeLuma / estBit).

This script encodes a calibration frame (cactus 256x256 luma - disjoint from
the rgb_library / parkscene evaluation content) with the host RDO encoder at
each protocol QP and snapshots its end-of-frame estimation contexts
(`FrameEncoder.est_ctx`, which evolve exactly like the serializer's), writing
them to parallel/_ctx_calibration.npz for rate_model to pick up.
"""

import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

from context_adaptive_neural_network_based_prediction_tpu.codec import encoder
from context_adaptive_neural_network_based_prediction_tpu.evaluation import (
    hm_driver)
from context_adaptive_neural_network_based_prediction_tpu.parallel import (
    rate_model)

QPS = (17, 22, 27, 32, 37, 42)


def main():
    frame = hm_driver.load_luminance(
        "/root/reference/hevc/visualization/map_intra_prediction_modes/"
        "readme/luminance_cactus.png")[300:556, 500:756]
    out = {}
    for qp in QPS:
        enc = encoder.FrameEncoder(frame, qp)
        enc.encode()
        out[f"qp{qp}"] = enc.est_ctx.astype(np.int32)
        print(f"QP{qp}: contexts snapshotted", flush=True)
    np.savez(rate_model.CALIBRATION_PATH, **out)
    print(f"wrote {rate_model.CALIBRATION_PATH}")


if __name__ == "__main__":
    main()
