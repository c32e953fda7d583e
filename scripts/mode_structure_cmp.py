"""Decision-structure comparison of HM's stream vs ours on the same source:
split-flag usage, NxN rate, MPM hit rate, depth histogram."""

import collections
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

from context_adaptive_neural_network_based_prediction_tpu.codec import (
    cabac, contexts, hm_decoder)

OFFSETS = contexts.OFFSETS


def analyze(stream, label):
    stats = collections.Counter()
    orig_bin = cabac.CabacDecoder.decode_bin

    def bin_(self, ctx, idx):
        v = orig_bin(self, ctx, idx)
        if OFFSETS.split_cu <= idx < OFFSETS.split_cu + 3:
            stats["split_flags"] += 1
            stats["split_ones"] += v
        elif idx == OFFSETS.part_size:
            stats["part_flags"] += 1
            stats["nxn"] += (1 - v)
        elif idx == OFFSETS.prev_intra:
            stats["pu"] += 1
            stats["mpm_hit"] += v
        return v

    cabac.CabacDecoder.decode_bin = bin_
    try:
        d = hm_decoder.HmFrameDecoder(stream)
        res = d.decode(use_native="never")
    finally:
        cabac.CabacDecoder.decode_bin = orig_bin
    hist = np.bincount(d.depth_map.ravel(), minlength=4)
    units = d.depth_map.size
    print(f"{label}: splits {stats['split_ones']}/{stats['split_flags']}  "
          f"NxN {stats['nxn']}/{stats['part_flags']}  "
          f"MPM {stats['mpm_hit']}/{stats['pu']} "
          f"({100*stats['mpm_hit']/max(stats['pu'],1):.0f}%)  "
          f"depth-units {list(hist)} / {units}")
    return res, d


def main():
    src = np.load("/root/repo/tests/golden_hm/128_full_q32_src.npy")
    hm_stream = open("/root/repo/tests/golden_hm/128_full_q32.bin", "rb").read()

    from context_adaptive_neural_network_based_prediction_tpu.codec import (
        encoder, hm_encoder)

    fe = encoder.FrameEncoder(src, 32)
    res = fe.encode()
    ours = hm_encoder.assemble_hm_stream(
        res, sao_enabled=fe.sao, deblocking=fe.deblocking,
        sign_hiding=fe.sign_hiding, transform_skip=fe.transform_skip,
        max_tu_depth=fe.max_tu_depth, sao_grid=fe._sao_grid,
        strong_intra_smoothing=fe.strong_smoothing, ctu_size=fe.ctu)

    hm_res, hm_dec = analyze(hm_stream, "HM  ")
    our_res, our_dec = analyze(ours, "ours")
    same_mode = np.mean(hm_dec.mode_map == our_dec.mode_map)
    same_depth = np.mean(hm_dec.depth_map == our_dec.depth_map)
    print(f"mode-map agreement {100*same_mode:.1f}%  "
          f"depth-map agreement {100*same_depth:.1f}%")


if __name__ == "__main__":
    main()
