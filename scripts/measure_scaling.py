"""Wavefront encode scaling over a device mesh (halo-exchange path).

BASELINE.json asks for frames/s at 1 chip / 1 host / N hosts.  Real
multi-chip hardware is not reachable from this rig (one tunneled v5e chip),
so this measures the *sharded program* on 1/2/4/8 virtual CPU devices - the
same XLA program + ppermute collectives that run over ICI on a pod slice -
plus the single-real-chip TPU number from bench.py.

Fixed total work: one 512x512 frame, CTB-16 wavefront, QP 32; stripes of
512/N rows per device.  Output: artifacts/scaling_virtual_mesh.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

from context_adaptive_neural_network_based_prediction_tpu.parallel import (
    mesh as mesh_mod, tiled, wavefront)


def main():
    h = w = 512
    qp = 32
    rng = np.random.default_rng(0)
    frame = rng.integers(0, 256, (h, w), dtype=np.uint8)
    out = {"frame": f"{h}x{w}", "qp": qp, "mode": "halo (bit-exact)"}
    single_ref = None
    for nd in (1, 2, 4, 8):
        if nd == 1:
            import jax.numpy as jnp

            run = wavefront._jitted_wavefront(h, w, 16, qp)
            fdev = jnp.asarray(frame)
            np.asarray(run(fdev)[1])
            t0 = time.perf_counter()
            reps = 3
            for _ in range(reps):
                r, m, q = run(fdev)
                np.asarray(m)
            dt = (time.perf_counter() - t0) / reps
            single_recon = np.asarray(r)
        else:
            m = mesh_mod.make_mesh({"data": nd}, jax.devices()[:nd])
            recon, modes, qc = tiled.encode_frame_tiled_halo(
                frame, qp, m)          # warm-up/compile
            assert np.array_equal(recon, single_recon), (
                f"halo path diverged at {nd} devices")
            t0 = time.perf_counter()
            reps = 3
            for _ in range(reps):
                recon, modes, qc = tiled.encode_frame_tiled_halo(frame, qp, m)
            dt = (time.perf_counter() - t0) / reps
        fps = 1.0 / dt
        if single_ref is None:
            single_ref = fps
        out[f"devices_{nd}"] = {"fps": round(fps, 3),
                                "speedup_vs_1": round(fps / single_ref, 2)}
        print(f"{nd} device(s): {fps:.3f} fps "
              f"({fps / single_ref:.2f}x)", flush=True)
    with open("artifacts/scaling_virtual_mesh.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote artifacts/scaling_virtual_mesh.json")


if __name__ == "__main__":
    main()
