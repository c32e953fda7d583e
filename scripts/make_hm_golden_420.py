"""Generates golden HM-16.15 4:2:0 bitstreams + reconstructions.

Like scripts/make_hm_golden.py but with `intra_main.cfg` (Main profile,
4:2:0 8-bit).  Stores the bitstream plus the decoded Y plane and the
subsampled Cb/Cr planes exactly as HM wrote them.
"""

import os
import subprocess
import sys
import tempfile

import numpy as np

sys.path.insert(0, "/root/repo")

from context_adaptive_neural_network_based_prediction_tpu.utils import color, images

OUT = "/root/repo/tests/golden_hm"
ENC = "/tmp/hevc/hm_16_15_regular/bin/TAppEncoderStatic"
CFG = "/root/reference/hevc/configuration/intra_main.cfg"


def read_planes(path, h, w):
    with open(path, "rb") as f:
        y = np.fromfile(f, np.uint8, h * w).reshape(h, w)
        cb = np.fromfile(f, np.uint8, h * w // 4).reshape(h // 2, w // 2)
        cr = np.fromfile(f, np.uint8, h * w // 4).reshape(h // 2, w // 2)
    return y, cb, cr


def main():
    os.makedirs(OUT, exist_ok=True)
    rgb = images.read_image_mode(
        "/root/reference/hevc/pseudo_data/rgb_library.jpg", "RGB")
    ycbcr = color.rgb_to_ycbcr(rgb)

    cases = [
        ("420_64_nolf_q37", ycbcr[:64, :64], 37,
         ("--LoopFilterDisable=1", "--SAO=0")),
        ("420_128_nolf_q32", ycbcr[:128, :128], 32,
         ("--LoopFilterDisable=1", "--SAO=0")),
        ("420_128_full_q32", ycbcr[:128, :128], 32, ()),
        ("420_128_full_q22", ycbcr[64:192, 64:192], 22, ()),
        ("420_96x160_full_q37", ycbcr[:96, :160], 37, ()),
    ]
    for name, frame, qp, extra in cases:
        h, w = frame.shape[:2]
        with tempfile.TemporaryDirectory() as tmp:
            yi = os.path.join(tmp, "in.yuv")
            bo = os.path.join(OUT, f"{name}.bin")
            ro = os.path.join(tmp, "rec.yuv")
            with open(yi, "wb") as f:
                frame[:, :, 0].tofile(f)
                frame[::2, ::2, 1].tofile(f)
                frame[::2, ::2, 2].tofile(f)
            subprocess.run(
                [ENC, "-c", CFG, "-i", yi, "-b", bo, "-o", ro,
                 "-wdt", str(w), "-hgt", str(h), "--InputBitDepth=8",
                 "--InputChromaFormat=420", "--FramesToBeEncoded=1",
                 f"--QP={qp}", *extra], capture_output=True, check=True)
            y, cb, cr = read_planes(ro, h, w)
            np.savez(os.path.join(OUT, f"{name}_rec.npz"), y=y, cb=cb, cr=cr)
            print(name, h, w, qp, os.path.getsize(bo), "bytes")


if __name__ == "__main__":
    main()
