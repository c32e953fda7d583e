"""Mode-frequency statistics over test images (SURVEY P21 equivalent).

Reference parity: `collecting_stats_hevc_modes.py` - encode luma images at
QPs (22, 27, 32, 37, 42) with a chosen policy and report per-width mode-win
frequencies (directly from encoder decisions - no log scraping).
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np

from ..codec import encoder
from ..evaluation import stats
from ..utils import color, images


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--images", required=True, help="glob of RGB images")
    p.add_argument("--qps", type=int, nargs="+", default=list(stats.QPS_STATS))
    p.add_argument("--policy", default="regular",
                   choices=["regular", "substitution", "switch"])
    p.add_argument("--crop", type=int, default=256)
    p.add_argument("--output-dir", default="results/stats_modes")
    args = p.parse_args()

    paths = sorted(glob.glob(args.images))
    if not paths:
        raise SystemExit(f"no images match {args.images}")
    for qp in args.qps:
        results = []
        for path in paths:
            rgb = images.read_image_mode(path, "RGB")
            luma = color.rgb_to_ycbcr(rgb)[:args.crop, :args.crop, 0]
            luma = luma[: (luma.shape[0] // 8) * 8, : (luma.shape[1] // 8) * 8]
            results.append(encoder.encode_frame(luma, qp))
        counts = stats.accumulate_over_images(results)
        png = os.path.join(args.output_dir, f"mode_freq_qp{qp}.png")
        stats.plot_mode_frequencies(counts, png, title=f"QP {qp} ({args.policy})")
        np.save(os.path.join(args.output_dir, f"mode_counts_qp{qp}.npy"), counts)
        print(f"QP {qp}: total PUs {counts.sum()}, plots -> {png}")


if __name__ == "__main__":
    main()
