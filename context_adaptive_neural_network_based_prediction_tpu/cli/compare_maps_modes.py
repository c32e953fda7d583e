"""Colored intra-mode maps across policies and QPs (SURVEY P22 equivalent).

Reference parity: `comparing_maps_modes.py` - encode one luma image at several
QPs under each policy and write the colored PPM mode maps.
"""

from __future__ import annotations

import argparse
import os

from ..codec import encoder
from ..evaluation import maps
from ..evaluation.hm_driver import load_luminance


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("input", help="image or .yuv")
    p.add_argument("--height", type=int)
    p.add_argument("--width", type=int)
    p.add_argument("--qps", type=int, nargs="+", default=[22, 27, 32, 37, 42])
    p.add_argument("--policies", nargs="+", default=["regular"],
                   choices=["regular", "substitution", "switch"])
    p.add_argument("--output-dir", default="results/map_modes")
    p.add_argument("--hm-bitstream", action="store_true",
                   help="input is a real HEVC Annex-B bitstream: decode it "
                        "with the HM-conformant decoder and map ITS modes")
    args = p.parse_args()

    if args.hm_bitstream:
        from ..codec import hm_decoder
        from ..evaluation.maps import mode_map_to_rgb, write_ppm

        with open(args.input, "rb") as f:
            res = hm_decoder.decode_hm_stream(f.read())
        name = os.path.splitext(os.path.basename(args.input))[0]
        out = os.path.join(args.output_dir, f"map_modes_{name}_hm.ppm")
        os.makedirs(args.output_dir, exist_ok=True)
        write_ppm(out, mode_map_to_rgb(res.mode_map))
        print(f"HM stream (QP {res.qp}, hash_ok={res.hash_ok}) -> {out}")
        return

    luma = load_luminance(args.input, args.height, args.width)
    name = os.path.splitext(os.path.basename(args.input))[0]
    for policy in args.policies:
        for qp in args.qps:
            res = encoder.encode_frame(luma, qp, policy=policy)
            out = os.path.join(args.output_dir,
                               f"map_modes_qp_{qp}_{name}_{policy}.ppm")
            maps.write_mode_map(res, out)
            print(f"{policy} QP{qp} -> {out}")


if __name__ == "__main__":
    main()
