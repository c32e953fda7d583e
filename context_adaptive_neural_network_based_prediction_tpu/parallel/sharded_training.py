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


def run_sharded_demo_step(mesh, width_target: int = 8,
                          is_fully_connected: bool = True,
                          batch_size: int = 16, seed: int = 0):
    """One sharded training step on synthetic data (used by dryrun_multichip)."""
    import jax

    rng = np.random.default_rng(seed)
    w = width_target
    above = rng.integers(0, 256, (batch_size, w, 3 * w, 1), dtype=np.uint8)
    left = rng.integers(0, 256, (batch_size, 2 * w, w, 1), dtype=np.uint8)
    targets = rng.integers(0, 256, (batch_size, w, w, 1), dtype=np.uint8)

    init_fn, step_fn = make_sharded_train_step(mesh, w, is_fully_connected)
    state = init_fn(jax.random.PRNGKey(seed))
    state, loss = step_fn(state, jax.random.PRNGKey(seed + 1),
                          above, left, targets)
    return float(loss)
