"""Worker for the multi-process (jax.distributed) CPU test.

Launched N times by tests/test_multiprocess.py: each process owns one CPU
device, joins the distributed runtime, and runs the halo-exchange tiled
wavefront encode over the GLOBAL mesh - the per-step `ppermute` of boundary
reconstruction rows crosses the process boundary exactly as it would cross
ICI/DCN between TPU hosts.  Process 0 prints digests of the gathered result
for the parent to check against the single-process encode.
"""

import hashlib
import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]

    os.environ["JAX_PLATFORMS"] = "cpu"
    # One device per process (a parent test runner may export
    # --xla_force_host_platform_device_count=8; strip it).
    os.environ["XLA_FLAGS"] = " ".join(
        f for f in os.environ.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f)
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc

    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from jax.experimental.shard_map import shard_map
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from context_adaptive_neural_network_based_prediction_tpu.parallel import (
        wavefront)

    devices = jax.devices()          # global devices, one per process
    assert len(devices) == nproc
    mesh = Mesh(np.array(devices), ("data",))

    n = 16
    tile_h, w = 2 * n, 4 * n
    h = nproc * tile_h
    rng = np.random.default_rng(0)
    frame = rng.integers(0, 256, (h, w), dtype=np.uint8)

    run = wavefront._jitted_wavefront(tile_h, w, n, 32,
                                      halo_axis="data", n_tiles=nproc)

    def per_tile(tile):
        recon, modes, qcoeffs = run(tile.reshape(tile_h, w))
        return recon[None], modes[None], qcoeffs[None]

    sharded = jax.jit(shard_map(
        per_tile, mesh=mesh,
        in_specs=P("data", None),
        out_specs=(P("data", None, None), P("data", None, None),
                   P("data", None, None, None, None))))

    frame_global = multihost_utils.host_local_array_to_global_array(
        frame[pid * tile_h:(pid + 1) * tile_h], mesh, P("data", None))
    recon_t, modes_t, _ = sharded(frame_global)
    recon = multihost_utils.process_allgather(recon_t, tiled=True)
    modes = multihost_utils.process_allgather(modes_t, tiled=True)
    if pid == 0:
        recon = np.asarray(recon).reshape(h, w)
        modes = np.asarray(modes).reshape(h // n, w // n)
        print("RECON_MD5", hashlib.md5(recon.tobytes()).hexdigest(),
              flush=True)
        print("MODES_MD5", hashlib.md5(modes.tobytes()).hexdigest(),
              flush=True)


if __name__ == "__main__":
    main()
