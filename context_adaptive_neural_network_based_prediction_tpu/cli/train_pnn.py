"""Trains one PNN (reference `training_pnn.py` equivalent).

Example:
    python -m context_adaptive_neural_network_based_prediction_tpu.cli.train_pnn \
        8 --arch fully_connected --shards sets/results/training_set/luminance \
        --mean 117.8952 --iters 800000
"""

from __future__ import annotations

import argparse
import os
import time

from ..data.pipeline import TrainingPipeline
from ..models import training, zoo
from ..utils import parsing


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("width_target", type=parsing.int_strictly_positive)
    p.add_argument("--arch", choices=("fully_connected", "convolutional"),
                   default="fully_connected")
    p.add_argument("--shards", required=True,
                   help="directory of training shards (thread_i/data_j.npz)")
    p.add_argument("--mean", type=float, required=True,
                   help="training mean intensity")
    p.add_argument("--results-root", default="pnn/results")
    p.add_argument("--channel", default="luminance")
    p.add_argument("--pair", action="store_true")
    p.add_argument("--coeff-l2", type=parsing.float_positive, default=1.0)
    p.add_argument("--coeff-grad", type=parsing.float_positive, default=0.0)
    p.add_argument("--masks", type=parsing.tuple_two_positive_integers,
                   default=None, help='"wa,hl" fixed masks; omit for random')
    p.add_argument("--batch-size", type=parsing.int_strictly_positive, default=100)
    p.add_argument("--iters", type=parsing.int_strictly_positive,
                   default=training.NB_ITERS_TRAINING)
    p.add_argument("--snapshot-every", type=parsing.int_strictly_positive,
                   default=10_000)
    p.add_argument("--chunk", type=parsing.int_strictly_positive, default=100,
                   help="training steps fused into one device dispatch "
                        "(amortizes dispatch latency on remote-attached TPUs)")
    p.add_argument("--dp", type=parsing.int_strictly_positive, default=1,
                   help="data-parallel mesh width (devices along 'data')")
    p.add_argument("--tp", type=parsing.int_strictly_positive, default=1,
                   help="tensor-parallel mesh width (devices along 'model')")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    is_fc = args.arch == "fully_connected"
    w = args.width_target
    out_dir = zoo.model_directory(args.results_root, w, is_fc, args.pair,
                                  args.channel, args.coeff_l2, args.coeff_grad,
                                  args.masks)
    os.makedirs(out_dir, exist_ok=True)

    if args.dp * args.tp > 1:
        # Multi-chip: the production DP x TP sharded path.
        from ..parallel import mesh as mesh_mod, sharded_training

        mesh = mesh_mod.make_mesh({"data": args.dp, "model": args.tp},
                                  jax.devices()[:args.dp * args.tp])
        sharded_training.train_sharded(
            mesh, args.shards, w, is_fc, args.mean, out_dir,
            iters=args.iters, batch_size=args.batch_size, chunk=args.chunk,
            snapshot_every=args.snapshot_every, coeff_l2=args.coeff_l2,
            coeff_grad=args.coeff_grad,
            log=lambda m: print(m, flush=True))
        return

    ckpt, start = training.find_latest_checkpoint(out_dir)
    if ckpt:
        state = training.restore_checkpoint(ckpt, w)
        print(f"resumed from {ckpt} (step {start})")
    else:
        state = training.init_state(jax.random.PRNGKey(0), w, is_fc,
                                    total_iters=args.iters)

    pipe = TrainingPipeline(args.shards, args.batch_size, w,
                            is_extraction_on_the_fly=(w >= 16))
    import numpy as np

    batches = pipe.batches()
    key = jax.random.PRNGKey(1)
    masks = jnp.array(args.masks if args.masks else [0, 0])
    t0 = time.time()
    it = int(state.step)
    while it < args.iters:
        k = min(args.chunk, args.iters - it)
        stacked = [next(batches) for _ in range(k)]
        above = np.stack([b[0] for b in stacked])
        left = np.stack([b[1] for b in stacked])
        target = np.stack([b[2] for b in stacked])
        key, sub = jax.random.split(key)
        state, losses = training.train_chunk(
            state, sub, above, left, target, args.mean, masks,
            width_target=w, is_fully_connected=is_fc,
            coeff_l2=args.coeff_l2, coeff_grad=args.coeff_grad,
            random_masks=args.masks is None, total_iters=args.iters)
        it += k
        print(f"step {it}: loss {float(losses[-1]):.3f} "
              f"({(it - int(start)) / (time.time() - t0):.1f} it/s)", flush=True)
        if it % args.snapshot_every == 0 or it == args.iters:
            path = training.save_checkpoint(state, out_dir)
            print(f"snapshot {path}", flush=True)


if __name__ == "__main__":
    main()
