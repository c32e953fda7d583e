"""Multi-chip PNN training: data + tensor parallel over a named mesh.

The reference trains on a single accelerator (SURVEY.md §2.4).  Here the full
training step (mask draw -> preprocess -> forward -> loss -> Adam) is jitted
over a `Mesh` with axes:

* ``data``  - batch dimension sharded (data parallelism; XLA inserts psum for
  the gradient all-reduce);
* ``model`` - the FC hidden dimension (1200) and conv feature-map dimension
  sharded (tensor parallelism; XLA inserts all-gathers/reduce-scatters on the
  activations as needed).

Sharding is expressed purely with `NamedSharding` constraints on params and
batch - no per-op collectives are hand-written, per the scaling-book recipe:
pick a mesh, annotate shardings, let XLA place collectives on ICI.

Halo-exchange for the codec's spatial sharding lives in `wavefront_sharded`.
"""

from __future__ import annotations

import functools

import numpy as np


def shard_params(params, mesh, is_fully_connected: bool):
    """Applies tensor-parallel NamedShardings to a PNN param pytree."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    def spec_for(path_names, leaf):
        name = path_names[-1]
        if is_fully_connected:
            # weights_i: (in, out). Shard the 1200-wide dims over "model":
            # layer 0: (5w^2, 1200) -> (None, "model"); middle: ("model" in
            # would conflict) -> shard the out dim; last: (1200, w^2) ->
            # ("model", None).
            if name.startswith("weights"):
                idx = int(name.split("_")[1])
                if idx == 3:
                    return P("model", None)
                return P(None, "model")
            if name.startswith("biases"):
                idx = int(name.split("_")[1])
                if idx == 3:
                    return P(None)
                return P("model")
        else:
            # Conv kernels: (k, k, in, out) - shard output maps; merger
            # channelwise weights: (maps, in, out) - shard maps.
            if leaf.ndim == 4:
                return P(None, None, None, "model")
            if leaf.ndim == 3:
                return P("model", None, None)
            if leaf.ndim == 2:
                return P("model", None)
            if leaf.ndim == 1:
                return P("model") if leaf.shape[0] % mesh.shape["model"] == 0 else P(None)
        return P(None)

    def apply(path, leaf):
        names = [getattr(p, "key", str(p)) for p in path]
        spec = spec_for(names, leaf)
        # Only shard when divisible; fall back to replication.
        for axis_name, dim in zip(spec, leaf.shape):
            if axis_name is not None and dim % mesh.shape[axis_name] != 0:
                spec = P(*([None] * leaf.ndim))
                break
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(apply, params)


def make_sharded_train_step(mesh, width_target: int, is_fully_connected: bool,
                            mean_training: float = 117.895,
                            coeff_l2: float = 1.0, coeff_grad: float = 0.0):
    """Returns (init_fn, step_fn) where step_fn is jitted over the mesh.

    init_fn(key) -> sharded TrainState; step_fn(state, key, above, left,
    targets) -> (state, loss).  Batches enter sharded over the "data" axis.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..models import training

    data_sharding = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    def init_fn(key):
        state = training.init_state(key, width_target, is_fully_connected)
        params = shard_params(state.params, mesh, is_fully_connected)
        opt_state = jax.tree_util.tree_map(
            lambda l: jax.device_put(l, repl) if not hasattr(l, "sharding") or l.ndim == 0
            else l, state.opt_state)
        # Adam moments follow the param shardings naturally on first update.
        return training.TrainState(params, state.opt_state, state.step)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step_fn(state, key, above_u8, left_u8, targets_u8):
        above_u8 = jax.lax.with_sharding_constraint(above_u8, data_sharding)
        left_u8 = jax.lax.with_sharding_constraint(left_u8, data_sharding)
        targets_u8 = jax.lax.with_sharding_constraint(targets_u8, data_sharding)
        new_state, loss, _terms = training.train_step(
            state, key, above_u8, left_u8, targets_u8, mean_training,
            jnp.array([0, 0]), width_target=width_target,
            is_fully_connected=is_fully_connected,
            coeff_l2=coeff_l2, coeff_grad=coeff_grad, random_masks=True)
        return new_state, loss

    return init_fn, step_fn


def make_sharded_train_chunk(mesh, width_target: int,
                             is_fully_connected: bool,
                             mean_training: float = 117.895,
                             coeff_l2: float = 1.0, coeff_grad: float = 0.0,
                             total_iters: int | None = None):
    """The PRODUCTION DP x TP training path: K fused sharded updates.

    Returns (init_fn, chunk_fn): `chunk_fn(state, key, above, left, targets)`
    takes (K, B, ...) uint8 stacks with B sharded over the "data" mesh axis,
    params/Adam moments sharded over "model" (see `shard_params`), and runs K
    complete updates (mask draw -> preprocess -> forward -> loss -> Adam) in
    ONE device dispatch via `lax.scan` — the multi-chip twin of
    `models.training.train_chunk`, which `cli/train_pnn --dp/--tp` drives to
    convergence.  XLA places the DP gradient psums and TP activation
    collectives from the shardings alone (scaling-book recipe).
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..models import training

    kwargs = {}
    if total_iters is not None:
        kwargs["total_iters"] = total_iters
    batch_sharding = NamedSharding(mesh, P(None, "data"))

    def init_fn(key):
        state = training.init_state(key, width_target, is_fully_connected,
                                    **kwargs)
        params = shard_params(state.params, mesh, is_fully_connected)
        # Rebuild Adam moments ON the sharded params so they inherit the
        # tensor-parallel layout (moments are elementwise twins of params).
        opt = training.make_optimizer(width_target, **kwargs)
        return training.TrainState(params, opt.init(params), state.step)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def chunk_fn(state, key, above_u8, left_u8, targets_u8):
        above_u8 = jax.lax.with_sharding_constraint(above_u8, batch_sharding)
        left_u8 = jax.lax.with_sharding_constraint(left_u8, batch_sharding)
        targets_u8 = jax.lax.with_sharding_constraint(targets_u8,
                                                      batch_sharding)

        def body(carry, batch):
            st, k = carry
            k, sub = jax.random.split(k)
            a, l, t = batch
            st, loss, _ = training._train_step_impl(
                st, sub, a, l, t, mean_training, jnp.array([0, 0]),
                width_target=width_target,
                is_fully_connected=is_fully_connected,
                coeff_l2=coeff_l2, coeff_grad=coeff_grad, random_masks=True,
                **kwargs)
            return (st, k), loss

        (state, _), losses = jax.lax.scan(
            body, (state, key), (above_u8, left_u8, targets_u8))
        return state, losses

    return init_fn, chunk_fn


def train_sharded(mesh, shards_dir: str, width_target: int,
                  is_fully_connected: bool, mean_training: float,
                  out_dir: str, *, iters: int, batch_size: int = 100,
                  chunk: int = 50, snapshot_every: int = 10_000,
                  coeff_l2: float = 1.0, coeff_grad: float = 0.0,
                  log=print):
    """Drives `make_sharded_train_chunk` to convergence with checkpointing.

    The host pipeline stacks K batches per dispatch; state stays sharded on
    the mesh for the whole run and is gathered only for snapshots.
    """
    import time

    import jax

    from ..data.pipeline import TrainingPipeline
    from ..models import training

    init_fn, chunk_fn = make_sharded_train_chunk(
        mesh, width_target, is_fully_connected, mean_training,
        coeff_l2, coeff_grad, total_iters=iters)
    ckpt, start = training.find_latest_checkpoint(out_dir)
    if ckpt:
        host_state = training.restore_checkpoint(ckpt, width_target)
        sharded = init_fn(jax.random.PRNGKey(0))
        state = jax.tree_util.tree_map(
            lambda h, s: jax.device_put(np.asarray(h), s.sharding)
            if hasattr(s, "sharding") else h, host_state, sharded)
        log(f"resumed from {ckpt} (step {start})")
    else:
        state = init_fn(jax.random.PRNGKey(0))

    pipe = TrainingPipeline(shards_dir, batch_size, width_target,
                            is_extraction_on_the_fly=(width_target >= 16))
    batches = pipe.batches()
    key = jax.random.PRNGKey(1)
    t0 = time.time()
    it = int(jax.device_get(state.step))
    while it < iters:
        k = min(chunk, iters - it)
        stacked = [next(batches) for _ in range(k)]
        above = np.stack([b[0] for b in stacked])
        left = np.stack([b[1] for b in stacked])
        target = np.stack([b[2] for b in stacked])
        key, sub = jax.random.split(key)
        state, losses = chunk_fn(state, sub, above, left, target)
        it += k
        log(f"step {it}: loss {float(losses[-1]):.3f} "
            f"({(it - start) / (time.time() - t0):.1f} it/s)")
        if it % snapshot_every == 0 or it >= iters:
            path = training.save_checkpoint(state, out_dir)
            log(f"snapshot {path}")
    return state


def run_sharded_demo_step(mesh, width_target: int = 8,
                          is_fully_connected: bool = True,
                          batch_size: int = 16, seed: int = 0,
                          n_steps: int = 2):
    """A few PRODUCTION sharded chunk updates on synthetic data.

    Used by `dryrun_multichip`: exercises the same `make_sharded_train_chunk`
    path `train_sharded`/`cli/train_pnn --dp/--tp` run to convergence (the
    round-2 version stepped a separate single-step demo fn instead)."""
    import jax

    rng = np.random.default_rng(seed)
    w = width_target
    above = rng.integers(0, 256, (n_steps, batch_size, w, 3 * w, 1),
                         dtype=np.uint8)
    left = rng.integers(0, 256, (n_steps, batch_size, 2 * w, w, 1),
                        dtype=np.uint8)
    targets = rng.integers(0, 256, (n_steps, batch_size, w, w, 1),
                           dtype=np.uint8)

    init_fn, chunk_fn = make_sharded_train_chunk(mesh, w, is_fully_connected)
    state = init_fn(jax.random.PRNGKey(seed))
    state, losses = chunk_fn(state, jax.random.PRNGKey(seed + 1),
                             above, left, targets)
    assert int(jax.device_get(state.step)) == n_steps
    return float(losses[-1])
