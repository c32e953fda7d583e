"""PNN visualization: context arrangements and learned-filter grids.

Capability parity with `pnn/visualization.py` (SURVEY.md P15): save the
(above, left, target) arrangement of a context as one image, and plot the
pixel-facing weights of a PNN as a grid of filters.
"""

from __future__ import annotations

import numpy as np

from ..utils import images


def arrange_context_portions(portion_above: np.ndarray,
                             portion_left: np.ndarray,
                             target: np.ndarray | None = None,
                             mean_training: float = 0.0) -> np.ndarray:
    """Places above (w,3w[,1]) / left (2w,w[,1]) / target into one 3w x 3w image.

    Float (mean-removed) inputs get the mean added back; the unused quadrant
    is white, like the reference's arrangement images (`sets/arranging.py`).
    """
    a = np.asarray(portion_above)
    l = np.asarray(portion_left)
    if a.ndim == 3:
        a = a[..., 0]
    if l.ndim == 3:
        l = l[..., 0]
    w = a.shape[0]
    canvas = np.full((3 * w, 3 * w), 255.0)
    canvas[0:w, :] = a + mean_training
    canvas[w:3 * w, 0:w] = l + mean_training
    if target is not None:
        t = np.asarray(target)
        if t.ndim == 3:
            t = t[..., 0]
        canvas[w:2 * w, w:2 * w] = t + mean_training
    return np.clip(np.round(canvas), 0, 255).astype(np.uint8)


def save_context_arrangement(path: str, portion_above, portion_left,
                             target=None, mean_training: float = 0.0,
                             enlargement: int = 4) -> None:
    images.save_image(path, arrange_context_portions(
        portion_above, portion_left, target, mean_training), enlargement)


def fc_first_layer_filters(params: dict, width_target: int) -> np.ndarray:
    """Reshapes the FC net's first-layer weights into per-unit context filters.

    Returns (n_hidden, 3w, 3w) float images (above part on top, left part
    below-left, like the context arrangement; unused quadrant NaN).
    """
    fc = params.get("fully_connected", params)
    w0 = np.asarray(fc["weights_0"])  # (5w^2, hidden)
    w = width_target
    n_hidden = w0.shape[1]
    out = np.full((n_hidden, 3 * w, 3 * w), np.nan, dtype=np.float32)
    above = w0[: 3 * w * w].reshape(w, 3 * w, n_hidden)
    left = w0[3 * w * w:].reshape(2 * w, w, n_hidden)
    out[:, 0:w, :] = above.transpose(2, 0, 1)
    out[:, w:, 0:w] = left.transpose(2, 0, 1)
    return out


def conv_first_layer_filters(params: dict, branch: str = "branch_above") -> np.ndarray:
    """(n_maps, k, k) first-layer kernels of a conv branch."""
    conv = params.get("convolutional", params)
    kernels = np.asarray(conv[branch]["convolution_0"]["weights"])  # (k,k,1,out)
    return kernels[:, :, 0, :].transpose(2, 0, 1)


def plot_filter_grid(filters: np.ndarray, path_to_png: str, *,
                     max_filters: int = 64, title: str = "") -> None:
    """Saves a grid image of filters (n, h, w), each normalized to [0, 1]."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = min(filters.shape[0], max_filters)
    cols = int(np.ceil(np.sqrt(n)))
    rows = int(np.ceil(n / cols))
    fig, axes = plt.subplots(rows, cols, figsize=(1.3 * cols, 1.3 * rows),
                             squeeze=False)
    for i in range(rows * cols):
        ax = axes[i // cols][i % cols]
        ax.axis("off")
        if i < n:
            f = filters[i]
            finite = np.isfinite(f)
            lo, hi = f[finite].min(), f[finite].max()
            ax.imshow(np.where(finite, (f - lo) / (hi - lo + 1e-9), 1.0),
                      cmap="gray", vmin=0, vmax=1)
    fig.suptitle(title)
    import os

    os.makedirs(os.path.dirname(path_to_png) or ".", exist_ok=True)
    fig.savefig(path_to_png, dpi=120, bbox_inches="tight")
    plt.close(fig)
