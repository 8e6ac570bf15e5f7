"""On-device NMS with static shapes.

Replaces the reference's CUDA bitmask NMS (det3d/ops/iou3d_nms, wrapper
det3d/core/bbox/box_torch_ops.py:449 ``rotate_nms_pcdet``) and the numba
``circle_nms`` (det3d/core/utils/circle_nms_jit.py:5).

Design: candidates are already score-sorted and padded to a fixed ``pre_max``
size. A ``post_max``-step greedy loop picks the best alive candidate and kills
its neighbours by computing ONE IoU row per step — O(post_max * pre_max)
pairs instead of the full quadratic matrix, jit-friendly via lax.fori_loop.

Returns fixed-size index arrays padded with -1; callers carry a validity mask
instead of dynamic shapes.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .rotated_iou import rotated_iou_1_to_n


@partial(jax.jit, static_argnames=("post_max_size",))
def rotated_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
    post_max_size: int,
) -> jnp.ndarray:
    """Greedy rotated-BEV NMS.

    boxes: (K, 5) rects (cx, cy, dx, dy, heading), score-padded entries must
    carry ``scores = -inf``. scores: (K,). Returns (post_max_size,) int32
    indices into boxes, -1 padded.
    """
    k = boxes.shape[0]
    neg_inf = jnp.array(-jnp.inf, scores.dtype)

    def step(_, carry):
        alive_scores, selected, n_sel = carry
        i = jnp.argmax(alive_scores)
        ok = alive_scores[i] > neg_inf
        iou = rotated_iou_1_to_n(boxes[i], boxes)
        kill = (iou > iou_threshold) | (jnp.arange(k) == i)
        new_scores = jnp.where(ok & kill, neg_inf, alive_scores)
        selected = selected.at[n_sel].set(jnp.where(ok, i, -1))
        return new_scores, selected, n_sel + ok.astype(jnp.int32)

    selected0 = jnp.full((post_max_size,), -1, jnp.int32)
    _, selected, _ = jax.lax.fori_loop(
        0, post_max_size, step, (scores, selected0, jnp.int32(0))
    )
    return selected


@partial(jax.jit, static_argnames=("post_max_size",))
def circle_nms(
    centers: jnp.ndarray,
    scores: jnp.ndarray,
    min_radius: float,
    post_max_size: int,
) -> jnp.ndarray:
    """Center-distance NMS (reference circle_nms_jit.py:5-28).

    centers: (K, 2); suppress candidates with squared center distance to a
    kept box less than ``min_radius ** 2``. Padded entries: scores = -inf.
    """
    k = centers.shape[0]
    neg_inf = jnp.array(-jnp.inf, scores.dtype)
    thresh2 = jnp.asarray(min_radius, centers.dtype) ** 2

    def step(_, carry):
        alive_scores, selected, n_sel = carry
        i = jnp.argmax(alive_scores)
        ok = alive_scores[i] > neg_inf
        d2 = jnp.sum((centers - centers[i]) ** 2, axis=-1)
        kill = (d2 < thresh2) | (jnp.arange(k) == i)
        new_scores = jnp.where(ok & kill, neg_inf, alive_scores)
        selected = selected.at[n_sel].set(jnp.where(ok, i, -1))
        return new_scores, selected, n_sel + ok.astype(jnp.int32)

    selected0 = jnp.full((post_max_size,), -1, jnp.int32)
    _, selected, _ = jax.lax.fori_loop(
        0, post_max_size, step, (scores, selected0, jnp.int32(0))
    )
    return selected
