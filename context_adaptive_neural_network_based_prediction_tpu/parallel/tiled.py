"""Spatially-sharded frame encoding: tile rows across a device mesh.

HM's own scale-out primitives are tiles/WPP (SURVEY.md §2.4): prediction and
entropy state restart at tile boundaries, making tiles embarrassingly
parallel.  Here the frame is partitioned into horizontal tile stripes sharded
over a mesh axis; every device runs the fully-jitted wavefront encoder on its
stripe via `shard_map` (refs unavailable across the tile boundary, exactly
like HM tiles), and the host concatenates per-tile CABAC payloads.

`encode_frame_tiled_halo` removes the tile-boundary prediction break: the
stripes run on the single global wavefront schedule and exchange their
boundary reconstruction rows over ICI with `ppermute` after every step, so
the sharded encode equals the single-device wavefront BIT-EXACTLY (modes,
levels, reconstruction, and therefore the serialized stream) - the
framework's context-parallel/halo analog (SURVEY.md §2.4 last row, §5).
`encode_frame_tiled` keeps the independent-stripe mode (HM tile semantics,
no cross-tile traffic).
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


def encode_frame_tiled_halo(frame_uint8: np.ndarray, qp: int, mesh, *,
                            block_size: int = 16, axis: str = "data"):
    """Sharded wavefront encode with cross-tile causal halo exchange.

    Bit-exact vs the single-device wavefront: stripes follow the global
    t = bx + 2*by schedule (stripe d offset by 2*d*nby steps) and ppermute
    their bottom reconstructed pixel row down the mesh after every step.
    Returns (reconstruction, modes, qcoeffs) with the same values
    `wavefront.encode_frame_wavefront` produces for the whole frame.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental.shard_map import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    h, w = frame_uint8.shape
    n = block_size
    n_tiles = mesh.shape[axis]
    if h % (n_tiles * n) or w % n:
        raise ValueError(
            "frame height must split into tile stripes of whole blocks")
    tile_h = h // n_tiles

    run = wavefront._jitted_wavefront(tile_h, w, n, qp,
                                      halo_axis=axis, n_tiles=n_tiles)

    def per_tile(tile):
        recon, modes, qcoeffs = run(tile.reshape(tile_h, w))
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


def encode_frame_tiled_halo_v2(frame_uint8: np.ndarray, qp: int, mesh, *,
                               axis: str = "data", policy: str = "regular",
                               pnn=None, serialize: bool = False):
    """Sharded RD-grade (wavefront2 quadtree) encode with halo exchange.

    Stripes of CTB rows run the global wavefront2 schedule per device and
    `ppermute` their bottom CTB-row of reconstruction down the mesh each
    step (a full CTB because NN context portions reach `n` rows above a
    block).  Output — modes, levels, reconstruction, and the serialized
    stream — is BIT-EXACT vs the single-device `encode_frame_wavefront2`,
    including the neural policies (the quantized normative forward is
    reduction-order invariant, so resharding cannot perturb it).

    Returns an `EncodeResult` (bitstream empty unless `serialize`).
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental.shard_map import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    from . import wavefront2

    h, w = frame_uint8.shape
    n_tiles = mesh.shape[axis]
    ctb = wavefront2.CTB
    if h % (n_tiles * ctb) or w % ctb:
        raise ValueError(
            "frame must split into whole-CTB-row stripes per device")
    tile_h = h // n_tiles

    bundle = getattr(pnn, "bundle", pnn)
    run = wavefront2._jitted_wavefront2(
        tile_h, w, qp, 1.0, policy, bundle, halo_axis=axis, n_tiles=n_tiles)

    def per_tile(tile):
        outs = run(tile.reshape(tile_h, w))
        return jax.tree_util.tree_map(lambda o: o[None], outs)

    # out_specs: every output leaf gains a leading sharded tile axis.  The
    # halo build calls axis_index (untraceable outside shard_map), but its
    # output pytree is identical to the unsharded build's — eval_shape that.
    run_flat = wavefront2._jitted_wavefront2(tile_h, w, qp, 1.0, policy,
                                             bundle)

    def per_tile_shape(tile):
        outs = run_flat(tile.reshape(tile_h, w))
        return jax.tree_util.tree_map(lambda o: o[None], outs)

    out_shapes = jax.eval_shape(per_tile_shape,
                                jax.ShapeDtypeStruct((tile_h, w), jnp.uint8))
    out_specs = jax.tree_util.tree_map(
        lambda s: P(axis, *([None] * (s.ndim - 1))), out_shapes)
    sharded = shard_map(
        per_tile, mesh=mesh,
        in_specs=P(axis, None),
        out_specs=out_specs,
    )
    frame_dev = jax.device_put(
        jnp.asarray(frame_uint8), NamedSharding(mesh, P(axis, None)))
    recon_t, ys_t = jax.jit(sharded)(frame_dev)
    recon_t = np.asarray(recon_t)
    ys_t = jax.tree_util.tree_map(np.asarray, ys_t)

    # Per-stripe host assembly: stripe d runs the GLOBAL schedule offset by
    # 2*d*sby_local steps; its decided grids stack into the global frame.
    sby_local = tile_h // ctb
    parts = []
    for d in range(n_tiles):
        ys_d = jax.tree_util.tree_map(lambda a: a[d], ys_t)
        parts.append(wavefront2._assemble_arrays(
            ys_d, tile_h, w, ctb, t_offset=2 * sby_local * d))
    grids = tuple(np.concatenate([p[i] for p in parts], axis=0)
                  for i in range(len(parts[0])))
    arrays = (recon_t.reshape(-1, w),) + grids
    return wavefront2._arrays_to_result(frame_uint8, qp, arrays, policy,
                                        serialize)
