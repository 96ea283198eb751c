"""LR schedule library (optax schedules).

The reference vendors two scheduler libraries it never uses from its
entry scripts (`code/optimizers/lr_scheduler.py` MONAI copies,
`code/utils/lr_scheduler.py` detectron2 copies — SURVEY.md §2.5
"dead/vestigial"; the trainers inline poly decay). Provided here as
optax schedules so the capability exists without the dead code:

  poly (the one actually used), linear warmup + cosine anneal
  (LinearWarmupCosineAnnealingLR), warmup-cosine (WarmupCosineSchedule),
  warmup-poly, warmup-multistep.
"""
from __future__ import annotations

import jax.numpy as jnp
import optax

from icl_tpu.train.optim import poly_lr_schedule  # noqa: F401  (re-export)


def warmup_cosine_schedule(base_lr: float, warmup_steps: int, total_steps: int,
                           cycles: float = 0.5):
    """WarmupCosineSchedule (optimizers/lr_scheduler.py:62-89): linear
    0→1 warmup then cosine decay over the remaining progress."""

    def schedule(count):
        count = jnp.asarray(count, jnp.float32)
        warm = count / jnp.maximum(1.0, warmup_steps)
        progress = (count - warmup_steps) / jnp.maximum(1.0, total_steps - warmup_steps)
        cos = jnp.maximum(0.0, 0.5 * (1.0 + jnp.cos(jnp.pi * cycles * 2.0 * progress)))
        return base_lr * jnp.where(count < warmup_steps, warm, cos)

    return schedule


def linear_warmup_cosine_annealing(base_lr: float, warmup_epochs: int,
                                   max_epochs: int, warmup_start_lr: float = 0.0,
                                   eta_min: float = 0.0):
    """LinearWarmupCosineAnnealingLR (optimizers/lr_scheduler.py:92-171)."""

    def schedule(count):
        count = jnp.asarray(count, jnp.float32)
        warm = warmup_start_lr + (base_lr - warmup_start_lr) * count / jnp.maximum(
            1.0, warmup_epochs
        )
        progress = (count - warmup_epochs) / jnp.maximum(1.0, max_epochs - warmup_epochs)
        cos = eta_min + (base_lr - eta_min) * 0.5 * (1.0 + jnp.cos(jnp.pi * progress))
        return jnp.where(count < warmup_epochs, warm, cos)

    return schedule


def warmup_poly_schedule(base_lr: float, max_iterations: int, warmup_steps: int = 0,
                         warmup_factor: float = 1e-3, power: float = 0.9):
    """WarmupPolyLR (utils/lr_scheduler.py:15-45): linear warmup from
    warmup_factor, then poly decay."""
    poly = poly_lr_schedule(base_lr, max_iterations, power)

    def schedule(count):
        count_f = jnp.asarray(count, jnp.float32)
        alpha = count_f / jnp.maximum(1.0, warmup_steps)
        wf = warmup_factor * (1 - alpha) + alpha
        return jnp.where(count_f < warmup_steps, base_lr * wf, poly(count))

    return schedule


def warmup_multistep_schedule(base_lr: float, milestones, gamma: float = 0.1,
                              warmup_steps: int = 0, warmup_factor: float = 1e-3):
    """WarmupMultiStepLR (utils/lr_scheduler.py:48-81)."""
    milestones = jnp.asarray(sorted(milestones), jnp.float32)

    def schedule(count):
        count_f = jnp.asarray(count, jnp.float32)
        n_passed = jnp.sum(count_f >= milestones)
        lr = base_lr * gamma**n_passed
        alpha = count_f / jnp.maximum(1.0, warmup_steps)
        wf = warmup_factor * (1 - alpha) + alpha
        return jnp.where(count_f < warmup_steps, lr * wf, lr)

    return schedule


def sgd_with_schedule(schedule, momentum: float = 0.9, weight_decay: float = 1e-4):
    """torch-ordered SGD chain with an arbitrary schedule."""
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.trace(decay=momentum),
        optax.scale_by_learning_rate(schedule),
    )
