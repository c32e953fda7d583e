"""PNN training: optimizer, schedule, jitted train step, checkpoint/resume.

Parity with the reference training recipe
(`pnn/PredictionNeuralNetwork.py:8,144-169`, `training_pnn.py:43-57,118-163`,
`pnn/components.py:263-351`):

* Adam (TF defaults: b1=0.9, b2=0.999, eps=1e-8), 800,000 iterations, batch 100;
* piecewise-constant LR at steps {400k, 600k, 700k}: [1e-4..1e-7] for target
  widths <= 8, 4x higher for widths >= 16;
* loss = coeff_l2 * l2-norm error + coeff_grad * gradient error + weight decay
  (decay inside the loss, so it flows through Adam exactly as in the reference);
* random per-example masks drawn uniformly from {0, 4, ..., w} inside the
  jitted step (`sets/reading.py:391-410` semantics), or fixed masks;
* snapshots every `nb_iters_snapshot` (default 10k) with full resume (Adam
  state and global step persist, so the LR schedule survives resume).

TPU-first: the whole update (mask draw -> preprocessing -> forward -> loss ->
Adam) is one jitted function; data arrives as raw uint8 triplets and every
float op happens on device.
"""

from __future__ import annotations

import os
import pickle
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from . import losses, pnn

NB_ITERS_TRAINING = 800_000


class TrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: jnp.ndarray  # int32 scalar


def learning_rate_schedule(width_target: int, total_iters: int = NB_ITERS_TRAINING):
    """Piecewise-constant schedule keyed to the persisted global step.

    The reference decays at {1/2, 3/4, 7/8} of its fixed 800k-iteration budget
    (`pnn/PredictionNeuralNetwork.py:144-158`); `total_iters` rescales those
    boundaries so shorter budgets keep the same decay structure.
    """
    base = 1.0e-4 if width_target <= 8 else 4.0e-4
    return optax.piecewise_constant_schedule(
        init_value=base,
        boundaries_and_scales={
            total_iters // 2: 0.1,
            3 * total_iters // 4: 0.1,
            7 * total_iters // 8: 0.1,
        },
    )


def make_optimizer(width_target: int, total_iters: int = NB_ITERS_TRAINING):
    return optax.adam(learning_rate_schedule(width_target, total_iters),
                      b1=0.9, b2=0.999, eps=1e-8)


def init_state(key, width_target: int, is_fully_connected: bool,
               total_iters: int = NB_ITERS_TRAINING) -> TrainState:
    params = pnn.init_params(key, width_target, is_fully_connected)
    opt = make_optimizer(width_target, total_iters)
    return TrainState(params, opt.init(params), jnp.asarray(0, jnp.int32))


def _train_step_impl(state: TrainState, rng_key,
                     portions_above_uint8, portions_left_uint8, targets_uint8,
                     mean_training: float, masks: jnp.ndarray,
                     *, width_target: int, is_fully_connected: bool,
                     coeff_l2: float, coeff_grad: float, random_masks: bool,
                     total_iters: int = NB_ITERS_TRAINING):
    """One fused training update on a raw uint8 batch (traceable body).

    `masks` is a (2,) int array (width_mask_above, height_mask_left) used when
    `random_masks` is False; otherwise per-example masks are drawn uniformly
    from {0, 4, ..., w} inside the step.
    """
    w = width_target
    n = targets_uint8.shape[0]
    if random_masks:
        k1, k2 = jax.random.split(rng_key)
        wa = 4 * jax.random.randint(k1, (n,), 0, w // 4 + 1)
        hl = 4 * jax.random.randint(k2, (n,), 0, w // 4 + 1)
    else:
        wa = jnp.broadcast_to(masks[0], (n,))
        hl = jnp.broadcast_to(masks[1], (n,))

    above = portions_above_uint8.astype(jnp.float32) - mean_training
    left = portions_left_uint8.astype(jnp.float32) - mean_training
    cols = jnp.arange(3 * w).reshape(1, 1, -1, 1)
    rows = jnp.arange(2 * w).reshape(1, -1, 1, 1)
    above = jnp.where(cols >= 3 * w - wa.reshape(-1, 1, 1, 1), 0.0, above)
    left = jnp.where(rows >= 2 * w - hl.reshape(-1, 1, 1, 1), 0.0, left)
    targets = targets_uint8.astype(jnp.float32) - mean_training

    if is_fully_connected:
        inputs = jnp.concatenate([above.reshape(n, -1), left.reshape(n, -1)], axis=1)
    else:
        inputs = (above, left)

    def loss_fn(params):
        preds = pnn.forward(params, inputs, w, is_fully_connected)
        loss, terms = losses.total_loss(params, targets, preds, coeff_l2, coeff_grad)
        return loss, terms

    (loss, terms), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    opt = make_optimizer(w, total_iters)
    updates, new_opt_state = opt.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    new_state = TrainState(new_params, new_opt_state, state.step + 1)
    return new_state, loss, terms


train_step = jax.jit(_train_step_impl, static_argnames=(
    "width_target", "is_fully_connected", "coeff_l2", "coeff_grad",
    "random_masks", "total_iters"))


@partial(jax.jit, static_argnames=(
    "width_target", "is_fully_connected", "coeff_l2", "coeff_grad",
    "random_masks", "total_iters"))
def train_chunk(state: TrainState, rng_key,
                portions_above_uint8, portions_left_uint8, targets_uint8,
                mean_training: float, masks: jnp.ndarray,
                *, width_target: int, is_fully_connected: bool,
                coeff_l2: float, coeff_grad: float, random_masks: bool,
                total_iters: int = NB_ITERS_TRAINING):
    """K fused training updates in ONE device dispatch (lax.scan over stacked
    batches of shape (K, B, ...)).

    Per-step dispatch latency dominates small-model training on a
    remote-attached TPU; scanning K steps per call amortizes it K-fold while
    keeping update semantics identical to `train_step` (per-step RNG split,
    same optimizer/schedule).  Returns (state, per-step losses (K,))."""

    def body(carry, batch):
        st, key = carry
        key, sub = jax.random.split(key)
        a, l, t = batch
        st, loss, _ = _train_step_impl(
            st, sub, a, l, t, mean_training, masks,
            width_target=width_target, is_fully_connected=is_fully_connected,
            coeff_l2=coeff_l2, coeff_grad=coeff_grad,
            random_masks=random_masks, total_iters=total_iters)
        return (st, key), loss

    (state, _), losses = jax.lax.scan(
        body, (state, rng_key),
        (portions_above_uint8, portions_left_uint8, targets_uint8))
    return state, losses


# ------------------------------------------------------------ checkpoints ----

def save_checkpoint(state: TrainState, path_to_directory: str) -> str:
    """Writes `model_<step>.ckpt.pkl` holding params + Adam state + step."""
    os.makedirs(path_to_directory, exist_ok=True)
    step = int(state.step)
    host_state = jax.device_get(state)
    path = os.path.join(path_to_directory, f"model_{step}.ckpt.pkl")
    with open(path, "wb") as f:
        pickle.dump({"params": host_state.params,
                     "opt_state": host_state.opt_state,
                     "step": step}, f)
    return path


def restore_checkpoint(path: str, width_target: int) -> TrainState:
    with open(path, "rb") as f:
        blob = pickle.load(f)
    return TrainState(blob["params"], blob["opt_state"],
                      jnp.asarray(blob["step"], jnp.int32))


def find_latest_checkpoint(path_to_directory: str):
    """Returns (path, step) of the newest snapshot, or (None, 0)."""
    if not os.path.isdir(path_to_directory):
        return None, 0
    best_path, best_step = None, 0
    for name in os.listdir(path_to_directory):
        if name.startswith("model_") and name.endswith(".ckpt.pkl"):
            step = int(name[len("model_"):-len(".ckpt.pkl")])
            if step >= best_step:
                best_path, best_step = os.path.join(path_to_directory, name), step
    return best_path, best_step
