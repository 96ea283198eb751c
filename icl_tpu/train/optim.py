"""Optimizer: SGD + momentum + weight decay + per-step poly LR.

Matches the reference exactly (train_inherent_consistent_unet_2D.py:97-98,
132-134): torch SGD(momentum=0.9, weight_decay=1e-4) applies wd to ALL
params (incl. norms/biases) *before* the momentum buffer, and the LR is
poly-decayed `base_lr·(1−iter/max_iter)^0.9` re-set every iteration.
In JAX the schedule is a traced function of the optax step count, so the
whole update lives inside the jitted train step.
"""
from __future__ import annotations

import jax.numpy as jnp
import optax


def poly_lr_schedule(base_lr: float, max_iterations: int, power: float = 0.9):
    """lr(count) = base_lr·(1−count/max_iterations)^power.

    optax calls the schedule with the pre-increment count, so update k
    (1-indexed) uses (1−(k−1)/max)^p — identical to the reference, which
    sets the lr for step k+1 *after* step k using iter_num=k."""

    def schedule(count):
        frac = 1.0 - jnp.asarray(count, jnp.float32) / max_iterations
        return base_lr * jnp.maximum(frac, 0.0) ** power

    return schedule


def make_sgd(
    base_lr: float,
    max_iterations: int,
    momentum: float = 0.9,
    weight_decay: float = 1e-4,
    power: float = 0.9,
) -> optax.GradientTransformation:
    """torch-equivalent chain: g += wd·p; buf = m·buf + g; p -= lr·buf."""
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.trace(decay=momentum, nesterov=False),
        optax.scale_by_learning_rate(poly_lr_schedule(base_lr, max_iterations, power)),
    )
