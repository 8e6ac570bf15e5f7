"""Optimizer construction (reference: det3d/torchie/apis/train.py:168-263,
det3d/solver/fastai_optim.py).

The reference wraps torch Adam in a fastai OptimWrapper with "true" (decoupled)
weight decay and drives lr/momentum imperatively from OneCycle. Here the whole
thing is one optax transform with injected schedules, so the update rule lives
inside the jitted train step — no host-side per-step mutation.
"""
from __future__ import annotations

from typing import Optional

import optax

from .schedules import one_cycle_lr, one_cycle_momentum


def build_optimizer(optimizer_cfg, lr_cfg, total_steps: int,
                    grad_clip: Optional[dict] = None) -> optax.GradientTransformation:
    """Build from reference-schema cfgs: optimizer = dict(type='adam', wd=...,
    fixed_wd=True, amsgrad=...), lr_config = dict(type='one_cycle', lr_max=...,
    moms=[...], div_factor=..., pct_start=...)."""
    opt_type = optimizer_cfg.get("type", "adam").lower()
    wd = float(optimizer_cfg.get("wd", 0.0))
    fixed_wd = bool(optimizer_cfg.get("fixed_wd", True))
    lr_type = lr_cfg.get("type", "one_cycle")

    if lr_type == "one_cycle":
        lr_sched = one_cycle_lr(
            float(lr_cfg["lr_max"]), float(lr_cfg.get("div_factor", 10.0)),
            float(lr_cfg.get("pct_start", 0.4)), total_steps,
        )
        mom_sched = one_cycle_momentum(
            tuple(lr_cfg.get("moms", (0.95, 0.85))),
            float(lr_cfg.get("pct_start", 0.4)), total_steps,
        )
    else:
        raise NotImplementedError(f"lr schedule {lr_type}")

    if opt_type != "adam":
        raise NotImplementedError(f"optimizer {opt_type}")

    def make_adam(learning_rate, b1):
        if fixed_wd and wd > 0:
            return optax.adamw(learning_rate, b1=b1, b2=0.99, eps=1e-8, weight_decay=wd)
        return optax.adam(learning_rate, b1=b1, b2=0.99, eps=1e-8)

    tx = optax.inject_hyperparams(make_adam)(learning_rate=lr_sched, b1=mom_sched)

    chain = []
    if grad_clip is not None and grad_clip.get("max_norm"):
        chain.append(optax.clip_by_global_norm(float(grad_clip["max_norm"])))
    chain.append(tx)
    return optax.chain(*chain)
