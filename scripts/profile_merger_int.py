"""TPU microbenchmark: Pallas int merger vs XLA int dot at codec shapes.

Writes artifacts/merger_int_profile.json incrementally (VERDICT r2 task 6
evidence: kernel >= 1.2x XLA at the shapes the encoder runs, in the loop).
"""
import json, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np

def main():
    import jax, jax.numpy as jnp
    from context_adaptive_neural_network_based_prediction_tpu.ops.pallas import merger_int
    out = {"platform": jax.devices()[0].platform}
    rng = np.random.default_rng(0)
    def save():
        json.dump(out, open("artifacts/merger_int_profile.json", "w"), indent=1)
    for (n, p, o, m, tag) in ((31, 80, 16, 64, "w8_slots31"),
                              (31, 80, 16, 128, "w16_slots31"),
                              (17, 80, 16, 256, "w32_slots17")):
        x = jnp.asarray(rng.integers(-2047, 2048, (n, p, m)).astype(np.int16))
        w = jnp.asarray(rng.integers(-511, 512, (m, p, o)).astype(np.int16))
        b = jnp.asarray(rng.integers(-1e5, 1e5, (m, o)).astype(np.int32))
        pal = jax.jit(lambda x, w, b: merger_int.merger_int_forward(x, w, b, interpret=False))
        xla = jax.jit(lambda x, w, b: jax.lax.dot_general(
            x.transpose(2, 0, 1), w, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32) + b[:, None, :])
        rp = np.asarray(pal(x, w, b)); rx = np.asarray(xla(x, w, b))
        assert np.array_equal(rp, rx), tag
        def clock(f):
            f(x, w, b).block_until_ready()
            t0 = time.perf_counter()
            for _ in range(200):
                r = f(x, w, b)
            r.block_until_ready()
            return (time.perf_counter() - t0) / 200 * 1e6
        tp, tx = clock(pal), clock(xla)
        out[tag] = {"pallas_us": tp, "xla_us": tx, "speedup": tx / tp, "exact": True}
        print(tag, f"pallas {tp:.1f}us xla {tx:.1f}us speedup {tx/tp:.2f}x", flush=True)
        save()

if __name__ == "__main__":
    main()
