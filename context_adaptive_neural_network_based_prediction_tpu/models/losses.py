"""PNN training losses.

Parity with the reference (`pnn/tfutils.py:194-393`, `pnn/components.py:263-368`):

* l2-norm prediction error: mean over the batch of sqrt(sum((t - p)^2));
* gradient error: mean over the batch of the summed L1 norms of the finite-
  difference gradient mismatch along the 4 directions (0/45/90/135 degrees);
* weight decay: 5e-4 * sum over weight tensors of ||W||^2 / 2 (biases exempt).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

WEIGHT_DECAY_COEFF = 5.0e-4


def prediction_error_l2_norm(targets, predictions):
    """Mean over batch of the l2 norm of the prediction residual."""
    sums = jnp.sum((targets - predictions) ** 2, axis=(1, 2, 3))
    return jnp.mean(jnp.sqrt(sums))


def prediction_error_gradient(targets, predictions):
    """Mean summed L1 mismatch of finite-difference gradients in 4 directions."""
    def diffs(t):
        return (
            t[:, :, 1:, :] - t[:, :, :-1, :],       # 0 deg: right - left
            t[:, :-1, 1:, :] - t[:, 1:, :-1, :],    # 45 deg: top_right - bottom_left
            t[:, :-1, :, :] - t[:, 1:, :, :],       # 90 deg: top - bottom
            t[:, 1:, 1:, :] - t[:, :-1, :-1, :],    # 135 deg: bottom_right - top_left
        )

    total = 0.0
    for dt, dp in zip(diffs(targets), diffs(predictions)):
        total = total + jnp.sum(jnp.abs(dp - dt), axis=(1, 2, 3))
    return jnp.mean(total)


def weight_l2_norm(params) -> jnp.ndarray:
    """Cumulated 0.5*||W||^2 over every parameter whose leaf name starts with 'weights'."""
    total = 0.0
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if str(name).startswith("weights"):
            total = total + 0.5 * jnp.sum(leaf ** 2)
    return total


def total_loss(params, targets, predictions, coeff_l2: float, coeff_grad: float):
    """Scaled prediction losses + weight decay; returns (loss, dict of terms)."""
    if coeff_l2 < 0.0 or coeff_grad < 0.0:
        raise ValueError("loss coefficients must be non-negative.")
    if coeff_l2 == 0.0 and coeff_grad == 0.0:
        raise ValueError("at least one loss coefficient must be non-zero.")
    terms = {}
    loss = 0.0
    if coeff_l2:
        terms["l2_norm_pred_error"] = coeff_l2 * prediction_error_l2_norm(targets, predictions)
        loss = loss + terms["l2_norm_pred_error"]
    if coeff_grad:
        terms["grad_error"] = coeff_grad * prediction_error_gradient(targets, predictions)
        loss = loss + terms["grad_error"]
    terms["weight_decay"] = WEIGHT_DECAY_COEFF * weight_l2_norm(params)
    loss = loss + terms["weight_decay"]
    return loss, terms
