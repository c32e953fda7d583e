"""TPU throughput of wavefront2: single-frame vs frame-batched, per policy.

Writes artifacts/wavefront2_throughput.json.  VERDICT r2 task 2/9 evidence:
the same stream's fps (device) at batch 1 vs batch B, regular vs NN policy.
"""
import json, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np

def main():
    import jax, jax.numpy as jnp
    from context_adaptive_neural_network_based_prediction_tpu.parallel import wavefront2
    from context_adaptive_neural_network_based_prediction_tpu.models import zoo
    from PIL import Image

    h, w, qp = 1056, 1920, 32
    img = np.asarray(Image.open("/root/reference/hevc/visualization/map_intra_prediction_modes/readme/luminance_parkscene.png").convert("L"))
    frame = img[:h, :w].copy()
    import pickle
    with open("artifacts/training_set/luminance/means/mean_training.pkl","rb") as f:
        mean = float(pickle.load(f))
    import pickle as _p
    with open("/root/reference/sets/results/training_set/means/luminance/mean_training.pkl","rb") as f:
        ref_mean = float(_p.load(f, encoding="latin1"))
    means = {4: ref_mean, 8: ref_mean, 16: mean, 32: mean, 64: mean}
    bundle = zoo.load_codec_bundle("artifacts/frozen/manifest_trained.txt", means,
                                   quantized_manifest_path="artifacts/frozen/manifest_quantized.txt")
    out = {"platform": jax.devices()[0].platform, "h": h, "w": w, "qp": qp}
    for policy in ("regular", "substitution"):
        bnd = bundle if policy != "regular" else None
        run = wavefront2._jitted_wavefront2(h, w, qp, 1.0, policy, bnd)
        fdev = jnp.asarray(frame)
        t0=time.time(); r = run(fdev); np.asarray(r[1]); out[f"{policy}_compile_s"]=round(time.time()-t0,1)
        reps = 3
        t0=time.time()
        for _ in range(reps):
            r = run(fdev); np.asarray(r[1])
        dt=(time.time()-t0)/reps
        out[f"{policy}_b1_s"]=dt; out[f"{policy}_b1_fps"]=1.0/dt
        print(policy, "b1", dt, flush=True)
        for B in (4, 8):
            try:
                runb = wavefront2._jitted_wavefront2_batch(h, w, qp, 1.0, policy, bnd)
                frames = jnp.asarray(np.stack([frame]*B))
                t0=time.time(); rb = runb(frames); np.asarray(rb[1]); out[f"{policy}_b{B}_compile_s"]=round(time.time()-t0,1)
                t0=time.time()
                for _ in range(2):
                    rb = runb(frames); np.asarray(rb[1])
                dt=(time.time()-t0)/2
                out[f"{policy}_b{B}_s"]=dt; out[f"{policy}_b{B}_fps"]=B/dt
                print(policy, f"b{B}", dt, B/dt, "fps", flush=True)
            except Exception as e:
                out[f"{policy}_b{B}_error"]=str(e)[:200]; print("b",B,"failed",e, flush=True)
                break
    with open("artifacts/wavefront2_throughput.json","w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))

if __name__ == "__main__":
    main()
