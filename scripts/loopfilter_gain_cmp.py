"""Stage-wise SSE comparison: how much do deblock and SAO each gain, ours vs
HM, on the same 384^2 frame?  Decodes each stream while snapshotting the
reconstruction pre-filter / post-deblock / post-SAO.

Usage: loopfilter_gain_cmp.py [qp]
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

from context_adaptive_neural_network_based_prediction_tpu.codec import (
    encoder, hm_decoder, hm_encoder)
from context_adaptive_neural_network_based_prediction_tpu.codec import sao as sao_mod
from context_adaptive_neural_network_based_prediction_tpu.codec import deblock
from context_adaptive_neural_network_based_prediction_tpu.evaluation import \
    hm_driver
from scripts.forced_structure_probe import hm_encode

QP = int(sys.argv[1]) if len(sys.argv) > 1 else 32


def stages(stream, frame):
    """Returns SSE at (pre-filter, post-deblock, post-SAO)."""
    d = hm_decoder.HmFrameDecoder(stream)
    d.decode(use_native="auto")
    f64 = frame.astype(np.int64)

    def sse(img):
        return float(((f64 - img.astype(np.int64)) ** 2).sum())

    pre = d.recon.astype(np.uint8)
    post_db = pre
    if not d.sh.deblocking_disabled:
        post_db = deblock.deblock_luma(pre, d.tu_map, d.qp)
    post_sao = post_db
    if d.sh.sao_luma:
        grid = [[p if p is not None else sao_mod.SaoParams() for p in row]
                for row in d.sao_grid]
        post_sao = sao_mod.apply_sao(post_db, grid, d.ctu)
    return sse(pre), sse(post_db), sse(post_sao)


def main():
    frame = hm_driver.load_luminance(
        "/root/reference/hevc/pseudo_data/rgb_library.jpg")[:384, :384]
    hm_stream, _ = hm_encode(frame, QP)

    fe = encoder.FrameEncoder(frame, QP)
    res = fe.encode()
    ours = hm_encoder.assemble_hm_stream(
        res, sao_enabled=fe.sao, deblocking=fe.deblocking,
        sign_hiding=fe.sign_hiding, transform_skip=fe.transform_skip,
        max_tu_depth=fe.max_tu_depth, sao_grid=fe._sao_grid,
        strong_intra_smoothing=fe.strong_smoothing, ctu_size=fe.ctu)

    for label, stream in (("HM", hm_stream), ("ours", ours)):
        pre, db, sao = stages(stream, frame)
        print(f"QP{QP} {label:5s}: sse pre {pre:11.0f}  post-deblock {db:11.0f} "
              f"(gain {pre-db:9.0f})  post-SAO {sao:11.0f} (gain {db-sao:9.0f})",
              flush=True)


if __name__ == "__main__":
    main()
