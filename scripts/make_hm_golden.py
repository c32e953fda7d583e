"""Generates golden HM-16.15 bitstreams + reconstructions for interop tests.

Runs the reference-built TAppEncoderStatic (All-Intra, 4:0:0 8-bit,
intra_main_rext.cfg) on small luma crops at several QPs and tool subsets, and
stores (bitstream, HM reconstruction) pairs under tests/golden_hm/.  The
fixtures are committed so the pytest suite can verify HM-stream decoding
without HM binaries present.
"""

import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from context_adaptive_neural_network_based_prediction_tpu.evaluation import hm_driver

OUT = "/root/repo/tests/golden_hm"
ENC = "/tmp/hevc/hm_16_15_regular/bin/TAppEncoderStatic"


def main():
    os.makedirs(OUT, exist_ok=True)
    luma = hm_driver.load_luminance("/root/reference/hevc/pseudo_data/rgb_library.jpg")
    paths = hm_driver.HmPaths(encoder=ENC)

    cases = []
    # one-CTU frame, loop filters off: isolates CTU syntax + recon
    cases.append(("64_nolf_q37", luma[:64, :64], 37,
                  ("--LoopFilterDisable=1", "--SAO=0")))
    cases.append(("64_nolf_q22", luma[:64, :64], 22,
                  ("--LoopFilterDisable=1", "--SAO=0")))
    # multi-CTU, loop filters off
    cases.append(("128_nolf_q32", luma[:128, :128], 32,
                  ("--LoopFilterDisable=1", "--SAO=0")))
    # deblocking only
    cases.append(("128_db_q32", luma[:128, :128], 32, ("--SAO=0",)))
    # full toolset (deblock + SAO)
    cases.append(("128_full_q32", luma[:128, :128], 32, ()))
    cases.append(("128_full_q27", luma[64:192, 64:192], 27, ()))
    # non-square and non-CTU-multiple dims
    cases.append(("96x160_full_q37", luma[:96, :160], 37, ()))

    import subprocess
    import tempfile

    for name, frame, qp, extra in cases:
        h, w = frame.shape
        with tempfile.TemporaryDirectory() as tmp:
            from context_adaptive_neural_network_based_prediction_tpu.utils import yuv

            yuv_in = os.path.join(tmp, "in.yuv")
            bin_out = os.path.join(OUT, f"{name}.bin")
            rec_out = os.path.join(tmp, "rec.yuv")
            yuv.write_400_or_420(frame[:, :, None, None], yuv_in)
            cmd = [ENC, "-c", paths.config, "-i", yuv_in, "-b", bin_out,
                   "-o", rec_out, "-wdt", str(w), "-hgt", str(h),
                   "--InputBitDepth=8", "--InputChromaFormat=400",
                   "--FramesToBeEncoded=1", f"--QP={qp}", *extra]
            subprocess.run(cmd, capture_output=True, text=True, check=True)
            rec = yuv.read_400_or_420(h, w, 1, np.uint8, True, rec_out)[:, :, 0, 0]
            np.save(os.path.join(OUT, f"{name}_rec.npy"), rec)
            np.save(os.path.join(OUT, f"{name}_src.npy"), frame)
            print(name, h, w, qp, os.path.getsize(bin_out), "bytes")


if __name__ == "__main__":
    main()
