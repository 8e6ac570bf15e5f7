"""Learning-rate / momentum schedules as pure functions of the global step.

Rebuild of the fastai-style schedulers the reference drives imperatively per
step (det3d/solver/learning_schedules_fastai.py:77 OneCycle): cosine-anneal
lr low->max over ``pct_start`` of training, then max->low/1e4; momentum
anneals max->min then back. Here they are optax-compatible schedule callables
so the whole update stays inside one jitted train step.
"""
from __future__ import annotations

import jax.numpy as jnp


def annealing_cos(start, end, pct):
    cos_out = jnp.cos(jnp.pi * pct) + 1.0
    return end + (start - end) / 2.0 * cos_out


def one_cycle_lr(lr_max: float, div_factor: float, pct_start: float, total_steps: int):
    low_lr = lr_max / div_factor
    split = int(total_steps * pct_start)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        up = annealing_cos(low_lr, lr_max, step / jnp.maximum(split, 1))
        down = annealing_cos(
            lr_max, low_lr / 1e4,
            (step - split) / jnp.maximum(total_steps - split, 1),
        )
        return jnp.where(step < split, up, down)

    return schedule


def one_cycle_momentum(moms, pct_start: float, total_steps: int):
    m0, m1 = moms
    split = int(total_steps * pct_start)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        down = annealing_cos(m0, m1, step / jnp.maximum(split, 1))
        up = annealing_cos(m1, m0, (step - split) / jnp.maximum(total_steps - split, 1))
        return jnp.where(step < split, down, up)

    return schedule
