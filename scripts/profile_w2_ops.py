"""Op-level TPU profile of one wavefront2 encode: where does the 0.5 ms/
sub-stage dispatch floor actually go?

Traces a compiled run on the real chip, loads the xplane via
jax.profiler.ProfileData, and aggregates device-op durations by HLO op
category.  Drives the round-4 restructure (VERDICT task 1).

Usage: python scripts/profile_w2_ops.py [HxW] [qp] [policy] [steps|full]
"""

import collections
import glob
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from context_adaptive_neural_network_based_prediction_tpu.parallel import (
    wavefront2)

TRACE = "/tmp/w2trace"


def main():
    hw = sys.argv[1] if len(sys.argv) > 1 else "512x960"
    h, w = (int(t) for t in hw.split("x"))
    qp = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:h, 0:w]
    frame = np.clip(128 + 40 * np.sin(xx / 17.0) + 30 * np.cos(yy / 13.0)
                    + rng.normal(0, 6, (h, w)), 0, 255).astype(np.uint8)

    run = wavefront2._jitted_wavefront2(h, w, qp)
    import time
    t0 = time.time()
    out = run(jnp.asarray(frame))
    jax.block_until_ready(out)
    print(f"compile+first run: {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    out = run(jnp.asarray(frame))
    jax.block_until_ready(out)
    dt = time.time() - t0
    print(f"steady run: {dt:.3f}s ({1.0 / dt:.3f} fps)", flush=True)

    with jax.profiler.trace(TRACE):
        out = run(jnp.asarray(frame))
        jax.block_until_ready(out)

    paths = glob.glob(TRACE + "/**/*.xplane.pb", recursive=True)
    assert paths, "no xplane written"
    data = jax.profiler.ProfileData.from_file(sorted(paths)[-1])
    agg = collections.Counter()
    cnt = collections.Counter()
    total = 0.0
    for plane in data.planes:
        if "TPU" not in plane.name and "Device" not in plane.name:
            continue
        for line in plane.lines:
            for ev in line.events:
                name = ev.name
                dur = ev.duration_ns / 1e6
                key = name.split(".")[0].split("(")[0]
                agg[key] += dur
                cnt[key] += 1
                total += dur
    print(f"\ndevice op time total: {total:.1f} ms over {sum(cnt.values())} "
          f"events")
    for k, v in agg.most_common(40):
        print(f"  {v:9.2f} ms  x{cnt[k]:7d}  {k}")


if __name__ == "__main__":
    main()
