"""Golden tests for the vectorized 35-mode HEVC intra kernel.

A straightforward scalar transcription of HM-16.15's intra semantics (planar /
DC + filtering / angular with negative-angle projection and fractional
interpolation) serves as the oracle; the production kernel must match it
bit-for-bit on random reference samples for every width and mode.  Structural
identities (constant propagation, pure copy modes) are checked independently.
"""

import numpy as np
import pytest

from context_adaptive_neural_network_based_prediction_tpu.ops import intra


# ---------------------------------------------------------------- oracle ----

def oracle_predict(ref_top, ref_left, w, mode, filtered=True):
    """Scalar per-spec HM intra prediction. ref_top/ref_left are (2w+1,) ints."""
    ref_top = [int(v) for v in ref_top]
    ref_left = [int(v) for v in ref_left]
    top = ref_top[1:]    # top[0..2w-1]
    left = ref_left[1:]
    corner = ref_top[0]
    pred = [[0] * w for _ in range(w)]
    s = w.bit_length() - 1

    if mode == 0:  # planar
        TR, BL = top[w], left[w]
        for y in range(w):
            for x in range(w):
                hor = (left[y] << s) + w + (x + 1) * (TR - left[y])
                ver = (top[x] << s) + (y + 1) * (BL - top[x])
                pred[y][x] = (hor + ver) >> (s + 1)
    elif mode == 1:  # DC
        dc = (sum(top[:w]) + sum(left[:w]) + w) // (2 * w)
        for y in range(w):
            for x in range(w):
                pred[y][x] = dc
        if filtered and w <= 16:
            pred[0][0] = (top[0] + left[0] + 2 * dc + 2) >> 2
            for x in range(1, w):
                pred[0][x] = (top[x] + 3 * dc + 2) >> 2
            for y in range(1, w):
                pred[y][0] = (left[y] + 3 * dc + 2) >> 2
    else:
        is_ver = mode >= 18
        ang_mode = mode - 26 if is_ver else -(mode - 10)
        ang_tab = [0, 2, 5, 9, 13, 17, 21, 26, 32]
        inv_tab = [0, 4096, 1638, 910, 630, 482, 390, 315, 256]
        angle = (1 if ang_mode >= 0 else -1) * ang_tab[abs(ang_mode)]
        inv_angle = inv_tab[abs(ang_mode)]
        main = [corner] + (top if is_ver else left)
        side = [corner] + (left if is_ver else top)
        # refMain over k in [-w, 2w]
        ref_main = {}
        for k in range(0, 2 * w + 1):
            ref_main[k] = main[k]
        if angle < 0:
            inv_sum = 128
            k = -1
            while k > (w * angle) >> 5:
                inv_sum += inv_angle
                ref_main[k] = side[inv_sum >> 8]
                k -= 1
        tmp = [[0] * w for _ in range(w)]
        for y in range(w):
            delta_pos = (y + 1) * angle
            di = delta_pos >> 5
            f = delta_pos & 31
            for x in range(w):
                if f:
                    tmp[y][x] = ((32 - f) * ref_main[x + di + 1]
                                 + f * ref_main[x + di + 2] + 16) >> 5
                else:
                    tmp[y][x] = ref_main[x + di + 1]
        if angle == 0 and filtered and w <= 16:
            for y in range(w):
                v = tmp[y][0] + ((side[y + 1] - side[0]) >> 1)
                tmp[y][0] = min(max(v, 0), 255)
        if is_ver:
            pred = tmp
        else:
            for y in range(w):
                for x in range(w):
                    pred[y][x] = tmp[x][y]
    return np.array(pred, dtype=np.int32)


def random_refs(rng, n, w):
    ref_top = rng.integers(0, 256, (n, 2 * w + 1), dtype=np.int32)
    ref_left = rng.integers(0, 256, (n, 2 * w + 1), dtype=np.int32)
    ref_left[:, 0] = ref_top[:, 0]  # shared corner
    return ref_top, ref_left


# ----------------------------------------------------------------- tests ----

@pytest.mark.parametrize("w", [4, 8, 16, 32, 64])
def test_all_modes_match_oracle(w):
    rng = np.random.default_rng(w)
    n = 4 if w <= 16 else 1  # the scalar oracle is slow at large widths
    ref_top, ref_left = random_refs(rng, n, w)
    preds = np.asarray(intra.predict_all_modes(ref_top, ref_left))
    assert preds.shape == (n, 35, w, w)
    for i in range(n):
        for mode in range(35):
            expected = oracle_predict(ref_top[i], ref_left[i], w, mode)
            np.testing.assert_array_equal(
                preds[i, mode], expected,
                err_msg=f"width {w} mode {mode} example {i}")


@pytest.mark.parametrize("w", [4, 8, 16])
def test_unfiltered_matches_oracle(w):
    rng = np.random.default_rng(100 + w)
    ref_top, ref_left = random_refs(rng, 2, w)
    preds = np.asarray(intra.predict_all_modes(ref_top, ref_left, filtered_edges=False))
    for mode in (1, 10, 26):
        expected = oracle_predict(ref_top[0], ref_left[0], w, mode, filtered=False)
        np.testing.assert_array_equal(preds[0, mode], expected)


def test_constant_pattern_propagates():
    w = 8
    ref_top = np.full((1, 2 * w + 1), 123, dtype=np.int32)
    ref_left = np.full((1, 2 * w + 1), 123, dtype=np.int32)
    preds = np.asarray(intra.predict_all_modes(ref_top, ref_left))
    assert np.all(preds == 123)


def test_pure_copy_modes():
    w = 8
    rng = np.random.default_rng(7)
    ref_top, ref_left = random_refs(rng, 1, w)
    preds = np.asarray(intra.predict_all_modes(ref_top, ref_left, filtered_edges=False))
    # Mode 26 copies the top row; mode 10 copies the left column.
    for y in range(w):
        np.testing.assert_array_equal(preds[0, 26, y, :], ref_top[0, 1:w + 1])
    for x in range(w):
        np.testing.assert_array_equal(preds[0, 10, :, x], ref_left[0, 1:w + 1])


def test_mode2_and_34_are_diagonals():
    w = 4
    rng = np.random.default_rng(9)
    ref_top, ref_left = random_refs(rng, 1, w)
    preds = np.asarray(intra.predict_all_modes(ref_top, ref_left))
    # Mode 34 (angle +32, vertical): pred[y, x] = top[x + y + 1].
    for y in range(w):
        for x in range(w):
            assert preds[0, 34, y, x] == ref_top[0, 1 + x + y + 1]
    # Mode 2 (angle +32, horizontal): pred[y, x] = left[x + y + 1].
    for y in range(w):
        for x in range(w):
            assert preds[0, 2, y, x] == ref_left[0, 1 + x + y + 1]


def test_pad_intra_pattern():
    w = 4
    # Partial pattern: top row length w+1, left height 2w+1.
    pat = np.zeros((2 * w + 1, w + 1, 1), dtype=np.uint8)
    pat[0, :, 0] = np.arange(w + 1) + 10
    pat[:, 0, 0] = np.arange(2 * w + 1) + 10
    ref_top, ref_left = intra.pad_intra_pattern(pat, w)
    assert ref_top.shape == (2 * w + 1,)
    np.testing.assert_array_equal(ref_top[:w + 1], pat[0, :, 0])
    assert np.all(ref_top[w + 1:] == pat[0, w, 0])  # replicated top-right
    np.testing.assert_array_equal(ref_left, pat[:, 0, 0])


def test_predict_via_hevc_mode_single():
    w = 8
    rng = np.random.default_rng(11)
    pat = rng.integers(0, 256, (2 * w + 1, 2 * w + 1, 1), dtype=np.uint8)
    blk = intra.predict_via_hevc_mode(pat, w, 1)
    assert blk.shape == (w, w, 1)
    ref_top, ref_left = intra.pad_intra_pattern(pat, w)
    expected = oracle_predict(ref_top, ref_left, w, 1)
    np.testing.assert_array_equal(blk[..., 0], expected.astype(np.uint8))


def test_best_mode_finds_planted_mode():
    w = 8
    rng = np.random.default_rng(13)
    ref_top, ref_left = random_refs(rng, 6, w)
    all_preds = np.asarray(intra.predict_all_modes(ref_top, ref_left))
    # Plant each block's target as the output of a chosen mode -> best mode
    # must reach ~infinite PSNR there.
    planted = np.array([0, 1, 5, 18, 26, 34])
    targets = np.stack([all_preds[i, planted[i]] for i in range(6)])
    best_preds, best_modes, best_psnrs = intra.predict_best_mode(ref_top, ref_left, targets)
    np.testing.assert_array_equal(np.asarray(best_preds), targets)
    assert np.all(np.asarray(best_psnrs) > 80.0)
