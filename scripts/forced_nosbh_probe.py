"""Forced-structure probe with sign-data hiding OFF in both encoders:
isolates whether the remaining closed-loop J gap is SDH position choice."""

import os
import subprocess
import sys
import tempfile

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

from context_adaptive_neural_network_based_prediction_tpu.codec import (
    encoder, hm_decoder, hm_encoder, rdo)
from context_adaptive_neural_network_based_prediction_tpu.evaluation import \
    hm_driver
from context_adaptive_neural_network_based_prediction_tpu.utils import yuv
from scripts.forced_structure_probe import ForcedEncoder, record_tree

QP = int(sys.argv[1]) if len(sys.argv) > 1 else 32


def hm_encode_nosbh(frame, qp):
    enc = hm_driver.hm_binary("TAppEncoderStatic")
    cfg = "/root/reference/hevc/configuration/intra_main_rext.cfg"
    h, w = frame.shape
    with tempfile.TemporaryDirectory() as tmp:
        yi = os.path.join(tmp, "in.yuv")
        bo = os.path.join(tmp, "out.bin")
        ro = os.path.join(tmp, "rec.yuv")
        yuv.write_400_or_420(frame[:, :, None, None], yi)
        subprocess.run(
            [enc, "-c", cfg, "-i", yi, "-b", bo, "-o", ro,
             "-wdt", str(w), "-hgt", str(h), "--InputBitDepth=8",
             "--InputChromaFormat=400", "--FramesToBeEncoded=1",
             "--SignHideFlag=0", f"--QP={qp}"], capture_output=True,
            check=True)
        stream = open(bo, "rb").read()
        rec = yuv.read_400_or_420(h, w, 1, np.uint8, True, ro)[:, :, 0, 0]
    return stream, rec


def main():
    frame = hm_driver.load_luminance(
        "/root/reference/hevc/pseudo_data/rgb_library.jpg")[:384, :384]
    lam = rdo.lambda_for_qp(QP)
    hm_stream, hm_rec = hm_encode_nosbh(frame, QP)
    hm_bits = len(hm_stream) * 8
    hm_sse = float(((frame.astype(np.int64) - hm_rec.astype(np.int64)) ** 2)
                   .sum())
    j_hm = hm_sse + lam * hm_bits
    print(f"QP{QP} HM-noSBH : bits {hm_bits:7d} sse {hm_sse:11.0f} "
          f"J {j_hm:13.0f}")
    rec = record_tree(hm_stream)

    def run(label, fe):
        res = fe.encode()
        stream = hm_encoder.assemble_hm_stream(
            res, sao_enabled=fe.sao, deblocking=fe.deblocking,
            sign_hiding=fe.sign_hiding, transform_skip=fe.transform_skip,
            max_tu_depth=fe.max_tu_depth, sao_grid=fe._sao_grid,
            strong_intra_smoothing=fe.strong_smoothing, ctu_size=fe.ctu)
        hd = hm_decoder.decode_hm_stream(stream)
        assert np.array_equal(res.reconstruction, hd.reconstruction)
        bits = len(stream) * 8
        sse = float(((frame.astype(np.int64)
                      - res.reconstruction.astype(np.int64)) ** 2).sum())
        print(f"QP{QP} {label:9s}: bits {bits:7d} sse {sse:11.0f} "
              f"J {sse + lam * bits:13.0f}  (J/J_HM "
              f"{(sse + lam * bits) / j_hm:.4f})")

    run("free", encoder.FrameEncoder(frame, QP, sign_hiding=False))
    fe = ForcedEncoder(frame, QP, sign_hiding=False)
    fe.attach(rec, force_tu=False)
    run("structure", fe)
    fe = ForcedEncoder(frame, QP, sign_hiding=False, max_tu_depth=3)
    fe.attach(rec, force_tu=True)
    run("full", fe)


if __name__ == "__main__":
    main()
