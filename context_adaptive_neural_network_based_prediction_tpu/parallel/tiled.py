"""Spatially-sharded frame encoding: tile rows across a device mesh.

HM's own scale-out primitives are tiles/WPP (SURVEY.md §2.4): prediction and
entropy state restart at tile boundaries, making tiles embarrassingly
parallel.  Here the frame is partitioned into horizontal tile stripes sharded
over a mesh axis; every device runs the fully-jitted wavefront encoder on its
stripe via `shard_map` (refs unavailable across the tile boundary, exactly
like HM tiles), and the host concatenates per-tile CABAC payloads.

Cross-tile causal halo exchange (boundary rows over ICI with `ppermute`,
removing the tile-boundary prediction break) is the planned refinement - the
entry point and sharding layout are already tile-count agnostic.
"""

from __future__ import annotations

import numpy as np

from . import wavefront


def encode_frame_tiled(frame_uint8: np.ndarray, qp: int, mesh, *,
                       block_size: int = 16, axis: str = "data"):
    """Encodes tile stripes in parallel over `mesh` axis `axis`.

    Returns (reconstruction (H, W) uint8, modes (nby, nbx) int32,
    qcoeffs (nby, nbx, n, n) int32).  Each stripe behaves like an independent
    picture (HM tile semantics).
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental.shard_map import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    h, w = frame_uint8.shape
    n = block_size
    n_tiles = mesh.shape[axis]
    if h % (n_tiles * n) or w % n:
        raise ValueError("frame height must split into tile stripes of whole blocks")
    tile_h = h // n_tiles

    run = wavefront._jitted_wavefront(tile_h, w, n, qp)

    def per_tile(tile):
        tile = tile.reshape(tile_h, w)
        recon, modes, qcoeffs = run(tile)
        return recon[None], modes[None], qcoeffs[None]

    sharded = shard_map(
        per_tile, mesh=mesh,
        in_specs=P(axis, None),
        out_specs=(P(axis, None, None), P(axis, None, None),
                   P(axis, None, None, None, None)),
    )
    frame_dev = jax.device_put(
        jnp.asarray(frame_uint8), NamedSharding(mesh, P(axis, None)))
    recon_t, modes_t, qcoeffs_t = jax.jit(sharded)(frame_dev)
    recon = np.asarray(recon_t).reshape(h, w)
    modes = np.asarray(modes_t).reshape(h // n, w // n)
    qcoeffs = np.asarray(qcoeffs_t).reshape(h // n, w // n, n, n)
    return recon.astype(np.uint8), modes, qcoeffs
