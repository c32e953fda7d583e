"""Intra-mode usage statistics.

Capability parity with the reference's stats pipeline (SURVEY.md P9/P21,
`hevc/stats.py`, `collecting_stats_hevc_modes.py`): frequencies, per TB width,
of each mode winning the rate-distortion selection.  The reference
instruments HM with beacon prints and regex-parses them; here the encoder's
decision trees carry the exact decisions, so the statistics are computed
directly from `EncodeResult.ctu_trees` - no log scraping.

Widths tracked: {4, 8, 16, 32, 64}; modes 0..35 (35 = PNNS under the switch
policy).  The reference QP protocol for this experiment is
QPS_STATS = (22, 27, 32, 37, 42) (`collecting_stats_hevc_modes.py:319-320`).
"""

from __future__ import annotations

import numpy as np

QPS_STATS = (22, 27, 32, 37, 42)
WIDTHS = (4, 8, 16, 32, 64)
NB_MODES_MAX = 36


def collect_mode_counts(encode_result) -> np.ndarray:
    """(len(WIDTHS), 36) int64 histogram of RD-winning modes per PU width."""
    counts = np.zeros((len(WIDTHS), NB_MODES_MAX), dtype=np.int64)
    w_index = {w: i for i, w in enumerate(WIDTHS)}

    def walk(node):
        if node is None:
            return
        if node.split:
            for c in node.children:
                walk(c)
            return
        for pu in node.pus:
            counts[w_index[pu.n], pu.mode] += 1

    for tree in encode_result.ctu_trees:
        walk(tree)
    return counts


def counts_to_ratios(counts: np.ndarray) -> np.ndarray:
    """Row-normalized frequencies (rows with no samples stay zero)."""
    totals = counts.sum(axis=1, keepdims=True)
    with np.errstate(invalid="ignore", divide="ignore"):
        ratios = np.where(totals > 0, counts / totals, 0.0)
    return ratios


def accumulate_over_images(results) -> np.ndarray:
    total = np.zeros((len(WIDTHS), NB_MODES_MAX), dtype=np.int64)
    for r in results:
        total += collect_mode_counts(r)
    return total


def plot_mode_frequencies(counts: np.ndarray, path_to_png: str,
                          title: str = "") -> None:
    """Bar plots of mode win frequencies per width (reference-style)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    ratios = counts_to_ratios(counts)
    active = [i for i, w in enumerate(WIDTHS) if counts[i].sum() > 0]
    fig, axes = plt.subplots(len(active), 1, figsize=(10, 2.4 * len(active)),
                             squeeze=False)
    for ax_i, wi in enumerate(active):
        ax = axes[ax_i][0]
        ax.bar(np.arange(NB_MODES_MAX), ratios[wi])
        ax.set_ylabel(f"{WIDTHS[wi]}x{WIDTHS[wi]}")
        ax.set_xlim(-1, NB_MODES_MAX)
    axes[-1][0].set_xlabel("intra mode (35 = PNNS)")
    fig.suptitle(title)
    import os

    os.makedirs(os.path.dirname(path_to_png) or ".", exist_ok=True)
    fig.savefig(path_to_png, dpi=120, bbox_inches="tight")
    plt.close(fig)
