"""MFU measurement for the PNN hot kernels + wavefront step on real TPU.

VERDICT round-1 item 7: commit profiler/MFU evidence for the PNN forward and
the wavefront encode.  Measures wall-clock (post-warmup, block_until_ready)
for:

* Pallas fused FC-PNN forward (w=8) at serving batch sizes;
* Pallas channelwise-merger kernel (w=16 conv net shapes);
* XLA equivalents of both (the normative f32 path);
* one wavefront2 1080p device encode step amortized.

MFU = achieved_matmul_FLOPs / (time * peak).  Peak defaults to TPU v5e
(197 TFLOP/s bf16, 98.3 TFLOP/s f32 — jax-ml.github.io/scaling-book
hardware table); override with --peak-tflops.

Usage: python scripts/profile_mfu.py [--cpu]  (CPU run sanity-checks only).
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def timed(fn, *args, iters=20):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--peak-tflops", type=float, default=197.0,
                    help="bf16 peak of the target chip (v5e default)")
    ap.add_argument("--peak-tflops-f32", type=float, default=98.3)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from context_adaptive_neural_network_based_prediction_tpu.models import pnn
    from context_adaptive_neural_network_based_prediction_tpu.ops.pallas import (
        fc_forward, merger)

    platform = jax.devices()[0].platform
    results = {"platform": platform}

    # ---- FC PNN forward, w=8 ----
    w = 8
    params = pnn.init_params(jax.random.PRNGKey(0), w, True)
    d_in, hid, d_out = 5 * w * w, 1200, w * w
    for batch in (256, 2048):
        x = jnp.asarray(np.random.default_rng(0).normal(
            0, 30, (batch, d_in)).astype(np.float32))
        flops = 2 * batch * (d_in * hid + 2 * hid * hid + hid * d_out)
        t_pal = timed(lambda xx: fc_forward.fc_forward_pallas(params, xx, w), x)
        t_xla = timed(jax.jit(
            lambda xx: pnn.fc_forward(params["fully_connected"], xx, w)), x)
        results[f"fc_w8_b{batch}"] = {
            "pallas_us": t_pal * 1e6, "xla_us": t_xla * 1e6,
            "pallas_mfu_bf16": flops / t_pal / (args.peak_tflops * 1e12),
            "xla_mfu_f32": flops / t_xla / (args.peak_tflops_f32 * 1e12),
            "speedup": t_xla / t_pal,
        }

    # ---- channelwise merger, w=16 conv shapes ----
    strides = pnn.STRIDES_BRANCH[16]
    prod = int(np.prod(strides))
    m = 32 * prod
    rng = np.random.default_rng(1)
    for batch in (256, 2048):
        x0 = jnp.asarray(rng.normal(
            0, 1, (batch, 16 // prod, 48 // prod, m)).astype(np.float32))
        x1 = jnp.asarray(rng.normal(
            0, 1, (batch, 32 // prod, 16 // prod, m)).astype(np.float32))
        p = x0.shape[1] * x0.shape[2] + x1.shape[1] * x1.shape[2]
        o = (16 // prod) ** 2
        wgt = jnp.asarray(rng.normal(0, 0.1, (m, p, o)).astype(np.float32))
        b = jnp.asarray(rng.normal(0, 0.1, (m, o)).astype(np.float32))
        flops = 2 * m * batch * p * o
        t_pal = timed(lambda a, c: merger.merger_forward(
            wgt, b, a, c, 16 // prod, 16 // prod), x0, x1)
        t_xla = timed(jax.jit(lambda a, c: pnn.leaky_relu(
            pnn.channelwise_fc_merger(wgt, b, a, c, 16 // prod, 16 // prod))),
            x0, x1)
        results[f"merger_w16_b{batch}"] = {
            "pallas_us": t_pal * 1e6, "xla_us": t_xla * 1e6,
            "pallas_mfu_bf16": flops / t_pal / (args.peak_tflops * 1e12),
            "xla_mfu_f32": flops / t_xla / (args.peak_tflops_f32 * 1e12),
            "speedup": t_xla / t_pal,
        }

    # ---- wavefront2 1080p encode ----
    if not args.cpu:
        from context_adaptive_neural_network_based_prediction_tpu.parallel import (
            wavefront2)

        frame = (np.indices((1088, 1920)).sum(0) % 256).astype(np.uint8)
        run = wavefront2._jitted_wavefront2(1088, 1920, 32)
        fx = jnp.asarray(frame)
        t = timed(run, fx, iters=3)
        results["wavefront2_1080p_s"] = t
        results["wavefront2_1080p_fps"] = 1.0 / t

    print(json.dumps(results, indent=1))
    with open("artifacts/mfu_profile.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
