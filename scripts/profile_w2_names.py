"""Per-op-NAME TPU profile of one wavefront2 encode (round 5).

profile_w2_ops.py aggregates by category; this keeps full HLO op names so
the expensive slice-start / copy-start instances can be attributed to
specific program structures (scan carries, kernel packing transposes, the
per-step work-window slice).  Optionally cross-references an HLO dump
(XLA_FLAGS=--xla_dump_to) for shapes.

Usage: python scripts/profile_w2_names.py [HxW] [qp] [topN]
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

TRACE = "/tmp/w2trace_names"


def main():
    hw = sys.argv[1] if len(sys.argv) > 1 else "1056x1920"
    h, w = (int(t) for t in hw.split("x"))
    qp = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    top = int(sys.argv[3]) if len(sys.argv) > 3 else 45
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:h, 0:w]
    frame = np.clip(128 + 40 * np.sin(xx / 17.0) + 30 * np.cos(yy / 13.0)
                    + rng.normal(0, 6, (h, w)), 0, 255).astype(np.uint8)

    run = wavefront2._jitted_wavefront2(h, w, qp)
    out = jax.block_until_ready(run(jnp.asarray(frame)))
    with jax.profiler.trace(TRACE):
        out = jax.block_until_ready(run(jnp.asarray(frame)))

    paths = glob.glob(TRACE + "/**/*.xplane.pb", recursive=True)
    data = jax.profiler.ProfileData.from_file(sorted(paths)[-1])
    agg = collections.Counter()
    cnt = collections.Counter()
    for plane in data.planes:
        if "TPU" not in plane.name and "Device" not in plane.name:
            continue
        for line in plane.lines:
            for ev in line.events:
                agg[ev.name] += ev.duration_ns / 1e6
                cnt[ev.name] += 1
    for k, v in agg.most_common(top):
        print(f"  {v:9.2f} ms  x{cnt[k]:7d}  {k}")


if __name__ == "__main__":
    main()
