"""Prediction-quality benchmark: PNN vs best HEVC mode vs IPFCN-S.

Capability parity with `comparing_pnn_ipfcns_hevc_best_mode.py` (SURVEY.md
P19, paper Tables I-V): on test channels, draw random block positions, and for
each (training-mask config x validation-mask config):

* predict each target with the PNN given its masked context;
* predict with the best of the 35 HEVC modes (max-PSNR oracle sweep over the
  pattern built from the *unmasked* causal L);
* optionally predict with IPFCN-S;
* report mean prediction PSNR and the PNN win frequency, written as CSVs.

The HEVC-mode sweep and the PNN forwards are batched device calls rather than
the reference's per-target 35-iteration Cython loop.
"""

from __future__ import annotations

import csv
import os
from dataclasses import dataclass
from typing import Optional, Sequence

import numpy as np

from ..data import extraction, masking
from ..models import zoo
from ..ops import intra
from ..utils import metrics

# Reference mask configurations (comparing_pnn_ipfcns_hevc_best_mode.py):
# validation masks sweep {0, w/2? ...} - the script uses 4 configs of
# (width_mask_above, height_mask_left) per width; we parameterize freely.
DEFAULT_VAL_MASKS = ((0, 0), (0, "w"), ("w", 0), ("w", "w"))


def _resolve_mask(spec, w):
    return w if spec == "w" else int(spec)


@dataclass
class ComparisonRow:
    width_mask_above: int
    height_mask_left: int
    mean_psnr_pnn: float
    mean_psnr_hevc_best: float
    mean_psnr_ipfcn: Optional[float]
    pnn_win_frequency: float


def draw_positions(rng: np.random.Generator, height: int, width: int,
                   width_target: int, nb_positions: int):
    """Positions with full 3w x 3w support inside the channel, with at least
    one pixel of causal margin (the reference draws rows/cols >= 1... it draws
    uniformly in the valid extraction range)."""
    hi_r = height - 3 * width_target
    hi_c = width - 3 * width_target
    rows = rng.integers(0, hi_r + 1, nb_positions)
    cols = rng.integers(0, hi_c + 1, nb_positions)
    return rows, cols


def hevc_best_mode_predictions(channel_uint8: np.ndarray, width_target: int,
                               rows: np.ndarray, cols: np.ndarray,
                               targets_uint8: np.ndarray):
    """Best-of-35-modes predictions from the causal L of each position.

    The intra pattern is built from the row above / column left of the target
    (reference `hevc/intraprediction/intraprediction.py:10-101`), i.e. at
    (row_1st + w, col_1st + w) relative to the extraction origin.
    """
    w = width_target
    n = rows.size
    ch = channel_uint8[:, :, 0] if channel_uint8.ndim == 3 else channel_uint8
    ref_top = np.zeros((n, 2 * w + 1), np.int32)
    ref_left = np.zeros((n, 2 * w + 1), np.int32)
    for i in range(n):
        ty, tx = int(rows[i]) + w, int(cols[i]) + w  # target top-left
        ref_top[i, 0] = ch[ty - 1, tx - 1]
        top = ch[ty - 1, tx: tx + 2 * w]
        avail_t = min(2 * w, ch.shape[1] - tx)
        ref_top[i, 1:1 + avail_t] = top[:avail_t]
        if avail_t < 2 * w:
            ref_top[i, 1 + avail_t:] = ref_top[i, avail_t]
        left = ch[ty: ty + 2 * w, tx - 1]
        avail_l = min(2 * w, ch.shape[0] - ty)
        ref_left[i, 0] = ref_top[i, 0]
        ref_left[i, 1:1 + avail_l] = left[:avail_l]
        if avail_l < 2 * w:
            ref_left[i, 1 + avail_l:] = ref_left[i, avail_l]
    best_preds, best_modes, _ = intra.predict_best_mode(
        ref_top, ref_left, targets_uint8[:, :, :, 0])
    return np.asarray(best_preds).astype(np.uint8), np.asarray(best_modes)


def compare_on_channels(channels_uint8: np.ndarray, width_target: int,
                        params: dict, is_fully_connected: bool,
                        mean_training: float, *,
                        nb_positions_per_image: int = 10,
                        val_masks: Sequence = DEFAULT_VAL_MASKS,
                        ipfcn_params: Optional[dict] = None,
                        seed: int = 0):
    """Runs the comparison; returns [ComparisonRow] (one per mask config)."""
    rng = np.random.default_rng(seed)
    w = width_target
    aboves, lefts, targets, ch_list, row_list, col_list = [], [], [], [], [], []
    for i in range(channels_uint8.shape[0]):
        ch = channels_uint8[i]
        rows, cols = draw_positions(rng, ch.shape[0], ch.shape[1], w,
                                    nb_positions_per_image)
        a, l, t = extraction.extract_context_portions_targets_from_channel(
            ch, w, rows, cols)
        aboves.append(a)
        lefts.append(l)
        targets.append(t)
        ch_list.append(ch)
        row_list.append(rows)
        col_list.append(cols)
    above = np.concatenate(aboves)
    left = np.concatenate(lefts)
    target = np.concatenate(targets)

    # HEVC best-mode oracle is mask-independent (uses the unmasked L).
    hevc_preds = []
    for i, ch in enumerate(ch_list):
        hp, _ = hevc_best_mode_predictions(ch, w, row_list[i], col_list[i],
                                           targets[i])
        hevc_preds.append(hp)
    hevc_pred = np.concatenate(hevc_preds)
    psnr_hevc = metrics.compute_psnr_batch(target[:, :, :, 0], hevc_pred)

    ipfcn_psnr_mean = None
    if ipfcn_params is not None:
        from ..models import ipfcn

        ga, gl = [], []
        for i, ch in enumerate(ch_list):
            for r, c in zip(row_list[i], col_list[i]):
                # IPFCN lines occupy the 8-wide band hugging the target:
                # origin at (target_row - 8, target_col - 8).
                rr = int(r) + w - 8
                cc = int(c) + w - 8
                if rr < 0 or cc < 0:
                    rr = max(rr, 0)
                    cc = max(cc, 0)
                a8, l8 = ipfcn.extract_pair_groups_lines_from_channel(
                    ch, w, rr, cc)
                ga.append(a8)
                gl.append(l8)
        preds_ip = ipfcn.predict_uint8(ipfcn_params, np.stack(ga), np.stack(gl), w)
        ipfcn_psnr_mean = float(np.mean(
            metrics.compute_psnr_batch(target[:, :, :, 0], preds_ip)))

    rows_out = []
    for mask_spec in val_masks:
        wa = _resolve_mask(mask_spec[0], w)
        hl = _resolve_mask(mask_spec[1], w)
        processed = masking.preprocess_context_portions_targets(
            above, left, target, mean_training, (wa, hl), is_fully_connected)
        if is_fully_connected:
            inputs = processed[0]
        else:
            inputs = (processed[0], processed[1])
        pred = zoo.predict_by_batch(params, inputs, w, is_fully_connected)
        pred_u8 = np.clip(np.round(pred[:, :, :, 0] + mean_training), 0, 255
                          ).astype(np.uint8)
        psnr_pnn = metrics.compute_psnr_batch(target[:, :, :, 0], pred_u8)
        rows_out.append(ComparisonRow(
            width_mask_above=wa,
            height_mask_left=hl,
            mean_psnr_pnn=float(psnr_pnn.mean()),
            mean_psnr_hevc_best=float(psnr_hevc.mean()),
            mean_psnr_ipfcn=ipfcn_psnr_mean,
            pnn_win_frequency=float((psnr_pnn > psnr_hevc).mean()),
        ))
    return rows_out


def write_csv(rows: Sequence[ComparisonRow], path_to_csv: str) -> None:
    os.makedirs(os.path.dirname(path_to_csv) or ".", exist_ok=True)
    with open(path_to_csv, "w", newline="") as f:
        writer = csv.writer(f, delimiter=";")
        writer.writerow(["width_mask_above", "height_mask_left",
                         "mean_psnr_pnn", "mean_psnr_hevc_best",
                         "mean_psnr_ipfcn", "pnn_win_frequency"])
        for r in rows:
            writer.writerow([r.width_mask_above, r.height_mask_left,
                             f"{r.mean_psnr_pnn:.4f}",
                             f"{r.mean_psnr_hevc_best:.4f}",
                             "" if r.mean_psnr_ipfcn is None else f"{r.mean_psnr_ipfcn:.4f}",
                             f"{r.pnn_win_frequency:.4f}"])
