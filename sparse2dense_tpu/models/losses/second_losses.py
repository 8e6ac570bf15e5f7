"""SECOND/anchor-head losses (reference det3d/models/losses/losses.py).

Pure-JAX rebuilds of the three losses MultiGroupHead actually uses:
- SigmoidFocalLoss (losses.py:293)   — per-anchor-per-class focal loss
- WeightedSmoothL1Loss (losses.py:147) — codewise smooth L1 with code_weights
- WeightedSoftmaxClassificationLoss (losses.py:431) — direction classifier

All return per-anchor losses weighted by the supplied weights; reductions
happen in the head (matching the reference's create_loss contract,
mg_head.py:147-193).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def sigmoid_focal_loss(preds, targets, weights, alpha=0.25, gamma=2.0):
    """preds/targets: (B, A, C) logits / one-hot; weights (B, A).
    Returns (B, A, C) weighted focal loss."""
    per_entry_ce = (
        jnp.maximum(preds, 0) - preds * targets
        + jnp.log1p(jnp.exp(-jnp.abs(preds)))
    )
    p = jax.nn.sigmoid(preds)
    p_t = targets * p + (1 - targets) * (1 - p)
    modulating = jnp.power(1.0 - p_t, gamma)
    alpha_w = targets * alpha + (1 - targets) * (1 - alpha)
    return per_entry_ce * modulating * alpha_w * weights[..., None]


def weighted_smooth_l1(preds, targets, weights, sigma=3.0, code_weights=None):
    """preds/targets: (B, A, D); weights (B, A). Returns (B, A, D)."""
    sigma2 = sigma ** 2
    diff = preds - targets
    if code_weights is not None:
        diff = diff * jnp.asarray(code_weights)
    abs_diff = jnp.abs(diff)
    loss = jnp.where(
        abs_diff < 1.0 / sigma2,
        0.5 * sigma2 * jnp.square(diff),
        abs_diff - 0.5 / sigma2,
    )
    return loss * weights[..., None]


def weighted_softmax_ce(logits, targets, weights):
    """logits (B, A, C), targets one-hot (B, A, C), weights (B, A) ->
    (B, A) weighted cross-entropy."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.sum(targets * logp, axis=-1) * weights
