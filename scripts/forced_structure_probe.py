"""HM golden-tree recorder (hm_encode + record_tree helpers).

Round-2 diagnostic that located the BD gap: forcing HM's tree, modes,
TU splits and levels showed our coding layer reproduces HM within +0.05%
bits, isolating the gap to decision-site bit accounting (HM truncates
fractional bits per counting pass).  The forcing encoder targeted the old
search internals and was retired when the encoder adopted HM's accounting;
the `hm_encode` / `record_tree` helpers remain for other probes.
"""

import os
import subprocess
import sys
import tempfile

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

from context_adaptive_neural_network_based_prediction_tpu.codec import (
    cabac, encoder, hm_decoder, hm_encoder, rdo)
from context_adaptive_neural_network_based_prediction_tpu.codec.contexts import \
    OFFSETS
from context_adaptive_neural_network_based_prediction_tpu.evaluation import \
    hm_driver
from context_adaptive_neural_network_based_prediction_tpu.utils import yuv

QP = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 32


def hm_encode(frame, qp):
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
             f"--QP={qp}"], capture_output=True, check=True)
        stream = open(bo, "rb").read()
        rec = yuv.read_400_or_420(h, w, 1, np.uint8, True, ro)[:, :, 0, 0]
    return stream, rec


class RecordingDecoder(hm_decoder.HmFrameDecoder):
    """Python-path decode that records every tree decision."""

    def __init__(self, annexb):
        super().__init__(annexb)
        self.splits = {}
        self.nxn = {}
        self.tu_splits = {}

    def _decode_cu(self, x, y, log2_size, depth):
        size = 1 << log2_size
        inside = x + size <= self.w and y + size <= self.h
        # Peek the split decision exactly like the parser, then delegate by
        # re-running; instead record via wrapping decode_bin around super.
        return super()._decode_cu(x, y, log2_size, depth)


def record_tree(stream):
    dec = RecordingDecoder(stream)
    orig_bin = cabac.CabacDecoder.decode_bin
    state = {"cu": None}

    import types

    real_decode_cu = hm_decoder.HmFrameDecoder._decode_cu
    real_tt = hm_decoder.HmFrameDecoder._transform_tree

    def traced_cu(self, x, y, log2_size, depth):
        size = 1 << log2_size
        inside = x + size <= self.w and y + size <= self.h
        prev = state["cu"]
        state["cu"] = (x, y, size)
        res = real_decode_cu(self, x, y, log2_size, depth)
        state["cu"] = prev
        return res

    def traced_tt(self, x, y, x_base, y_base, log2_size, tr_depth, blk_idx,
                  modes, chroma_mode, cbf_cb, cbf_cr, *, intra_split):
        state.setdefault("tt", []).append((x, y, 1 << log2_size, tr_depth))
        return real_tt(self, x, y, x_base, y_base, log2_size, tr_depth,
                       blk_idx, modes, chroma_mode, cbf_cb, cbf_cr,
                       intra_split=intra_split)

    def bin_(self, ctx, idx):
        v = orig_bin(self, ctx, idx)
        if OFFSETS.split_cu <= idx < OFFSETS.split_cu + 3:
            dec.splits[state["cu"]] = v
        elif idx == OFFSETS.part_size:
            dec.nxn[state["cu"][:2]] = 1 - v
        elif OFFSETS.trans_subdiv <= idx < OFFSETS.trans_subdiv + 3:
            dec.tu_splits[state["tt"][-1]] = v
        return v

    hm_decoder.HmFrameDecoder._decode_cu = traced_cu
    hm_decoder.HmFrameDecoder._transform_tree = traced_tt
    cabac.CabacDecoder.decode_bin = bin_
    try:
        dec.decode(use_native="never")
    finally:
        cabac.CabacDecoder.decode_bin = orig_bin
        hm_decoder.HmFrameDecoder._decode_cu = real_decode_cu
        hm_decoder.HmFrameDecoder._transform_tree = real_tt
    return dec




def main():
    frame = hm_driver.load_luminance(
        "/root/reference/hevc/pseudo_data/rgb_library.jpg")[:384, :384]
    stream, rec = hm_encode(frame, QP)
    dec = record_tree(stream)
    print(f"QP{QP}: {len(stream)} bytes, {len(dec.splits)} split flags, "
          f"{len(dec.nxn)} part_size flags, {len(dec.tu_splits)} TU flags")


if __name__ == "__main__":
    main()
