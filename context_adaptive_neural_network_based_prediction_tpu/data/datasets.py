"""Dataset builders: test sets and sharded training sets.

Capability parity with the reference's `sets/` layer (SURVEY.md P4/P6/P23):

* test sets: a directory of RGB images -> (N, H, W, 3) uint8 array with
  portrait images rotated to landscape + the rotation index record
  (`sets/setstest/kodak.py:10-67` semantics, minus the network download -
  this environment has no egress, so images come from local paths);
* training sets: per image, YCbCr conversion, random 320x320 luma crops
  (w=None mode) or random (above, left, target) triplets for small widths
  (`sets/writing.py:355-366`), written as sharded .npz files under
  thread_i/data_j.npz (same tree convention, numpy container instead of
  TFRecord);
* "pair" mode compresses the crop with THIS framework's own wavefront encoder
  at a QP drawn from {32, 37, 42} (`creating_training_set.py:148`) - the
  reference shells out to HM for this (`sets/writing.py:373-390`); here the
  codec is in-process and TPU-batched;
* channel means over the training images (`sets/writing.py:23-106`).
"""

from __future__ import annotations

import os
import pickle
from typing import List, Optional, Sequence

import numpy as np

from ..utils import color, images
from . import extraction

WIDTH_CROP = 320
PAIR_QPS = (32, 37, 42)


def build_test_set(paths_to_images: Sequence[str], height: int, width: int):
    """Stacks RGB images into (N, height, width, 3), rotating portrait images.

    Returns (array, rotation_flags) where rotation_flags[i] is True if image i
    was rotated 90 degrees (reference kodak.py records the same).
    """
    out = []
    rotated = []
    for path in paths_to_images:
        arr = images.read_image_mode(path, "RGB")
        if arr.shape[0] > arr.shape[1]:
            arr = np.rot90(arr)
            rotated.append(True)
        else:
            rotated.append(False)
        if arr.shape[0] < height or arr.shape[1] < width:
            raise ValueError(f"{path} is smaller than {height}x{width}")
        out.append(arr[:height, :width])
    return np.stack(out), np.array(rotated)


def compute_luminance_mean(paths_to_images: Sequence[str], channel: int = 0) -> float:
    """Mean intensity of one YCbCr channel over a set of RGB images."""
    total, count = 0.0, 0
    for path in paths_to_images:
        ch = _load_channel(path, channel)
        if ch is None:
            continue
        total += float(ch.sum())
        count += ch.size
    if count == 0:
        raise ValueError("no usable images")
    return total / count


def _load_channel(path: str, channel: int):
    """Loads one YCbCr channel from an RGB image, or the plane of a grayscale
    image when `channel` is luminance.  Returns None for unusable images
    (CMYK, or chroma requested from grayscale), mirroring the reference
    builders' skip-on-mode-mismatch behaviour (`sets/writing.py:355-366`)
    while additionally accepting mode-L sources as luminance."""
    try:
        rgb = images.read_image_mode(path, "RGB")
        return color.rgb_to_ycbcr(rgb)[:, :, channel]
    except ValueError:
        pass
    if channel != 0:
        return None
    try:
        return images.read_image_mode(path, "L")
    except ValueError:
        return None


def _compress_channel_pair(channel_uint8: np.ndarray, qp: int) -> np.ndarray:
    """Returns the channel with this framework's compression artifacts."""
    from ..parallel import wavefront

    h, w = channel_uint8.shape
    h16, w16 = (h // 16) * 16, (w // 16) * 16
    res = wavefront.encode_frame_wavefront(channel_uint8[:h16, :w16], qp,
                                           serialize=False)
    out = channel_uint8.copy()
    out[:h16, :w16] = res.reconstruction
    return out


def create_training_shards(paths_to_images: Sequence[str],
                           path_to_directory: str,
                           *,
                           width_target: Optional[int] = None,
                           nb_shards: int = 4,
                           triplets_per_image: int = 10,
                           is_pair: bool = False,
                           channel: int = 0,
                           seed: int = 0,
                           images_per_file: int = 100) -> int:
    """Writes sharded training data under <dir>/thread_i/data_j.npz.

    width_target None: 320x320 channel crops (on-the-fly extraction for large
    widths happens in the input pipeline).  width_target in {4, 8}: offline
    (above, left, target) triplets.  Returns number of examples written.
    """
    rng = np.random.default_rng(seed)
    n_written = 0
    shard_buffers: List[list] = [[] for _ in range(nb_shards)]
    shard_file_idx = [0] * nb_shards

    def flush(shard):
        nonlocal n_written
        if not shard_buffers[shard]:
            return
        d = os.path.join(path_to_directory, f"thread_{shard}")
        os.makedirs(d, exist_ok=True)
        path = os.path.join(d, f"data_{shard_file_idx[shard]}.npz")
        if width_target is None:
            np.savez_compressed(path, crops=np.stack(shard_buffers[shard]))
        else:
            above = np.stack([b[0] for b in shard_buffers[shard]])
            left = np.stack([b[1] for b in shard_buffers[shard]])
            target = np.stack([b[2] for b in shard_buffers[shard]])
            np.savez_compressed(path, above=above, left=left, target=target)
        n_written += len(shard_buffers[shard])
        shard_buffers[shard] = []
        shard_file_idx[shard] += 1

    for i, path in enumerate(paths_to_images):
        ch = _load_channel(path, channel)
        if ch is None:
            continue
        if ch.shape[0] < WIDTH_CROP or ch.shape[1] < WIDTH_CROP:
            continue
        r = int(rng.integers(0, ch.shape[0] - WIDTH_CROP + 1))
        c = int(rng.integers(0, ch.shape[1] - WIDTH_CROP + 1))
        crop = ch[r:r + WIDTH_CROP, c:c + WIDTH_CROP]
        if is_pair:
            qp = int(rng.choice(PAIR_QPS))
            pair_plane = _compress_channel_pair(crop, qp)
            stacked = np.stack([crop, pair_plane], axis=-1)
        else:
            stacked = crop[..., None]
        shard = i % nb_shards
        if width_target is None:
            shard_buffers[shard].append(stacked)
        else:
            w = width_target
            hi = WIDTH_CROP - 3 * w
            rows = rng.integers(0, hi + 1, triplets_per_image)
            cols = rng.integers(0, hi + 1, triplets_per_image)
            for rr, cc in zip(rows, cols):
                a, l, t = extraction.extract_context_portions_target_from_channel(
                    stacked, w, int(rr), int(cc))
                shard_buffers[shard].append((a, l, t))
        if len(shard_buffers[shard]) >= images_per_file:
            flush(shard)
    for shard in range(nb_shards):
        flush(shard)
    return n_written


def save_mean_training(mean: float, path_to_directory: str) -> str:
    os.makedirs(path_to_directory, exist_ok=True)
    path = os.path.join(path_to_directory, "mean_training.pkl")
    with open(path, "wb") as f:
        pickle.dump(mean, f)
    return path


def load_mean_training(path: str) -> float:
    with open(path, "rb") as f:
        return float(pickle.load(f))
