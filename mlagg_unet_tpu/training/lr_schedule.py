"""Learning-rate schedules.

Pure functions epoch -> lr, matching the reference's *per-epoch* stepping:
* PolyLRScheduler (reference training/lr_scheduler/polylr.py:4):
  lr = lr0 * (1 - e/E)^0.9
* timm CosineLRScheduler as configured by the flagship trainer
  (nnUNetTrainer_MLAgg_2D_dt_MS.py:137-147): t_initial=num_epochs,
  lr_min=1e-6, warmup_t=10, warmup_lr_init=1e-4, per-epoch updates.

For optax we expose step-level schedules that hold the lr constant within an
epoch (steps_per_epoch known statically), reproducing per-epoch stepping.
"""
from __future__ import annotations

import math
from typing import Callable

import jax.numpy as jnp


def poly_lr(initial_lr: float, max_epochs: int, exponent: float = 0.9) -> Callable:
    def schedule(epoch):
        return initial_lr * (1 - epoch / max_epochs) ** exponent

    return schedule


def cosine_warmup_lr(
    initial_lr: float,
    max_epochs: int,
    lr_min: float = 1e-6,
    warmup_epochs: int = 10,
    warmup_lr_init: float = 1e-4,
) -> Callable:
    """timm CosineLRScheduler semantics with t_in_epochs=True:
    linear warmup from warmup_lr_init to initial_lr over warmup_epochs,
    then cosine decay to lr_min at max_epochs."""

    def schedule(epoch):
        epoch = jnp.asarray(epoch, dtype=jnp.float32)
        warmup_slope = (initial_lr - warmup_lr_init) / max(warmup_epochs, 1)
        warm = warmup_lr_init + epoch * warmup_slope
        t = jnp.clip((epoch - warmup_epochs) / max(max_epochs - warmup_epochs, 1), 0.0, 1.0)
        cos = lr_min + 0.5 * (initial_lr - lr_min) * (1 + jnp.cos(math.pi * t))
        return jnp.where(epoch < warmup_epochs, warm, cos)

    return schedule


def epoch_schedule_to_step_schedule(epoch_schedule: Callable, steps_per_epoch: int) -> Callable:
    """Wrap an epoch->lr fn so optax can call it with the global step count."""

    def schedule(step):
        epoch = step // steps_per_epoch
        return epoch_schedule(epoch)

    return schedule
