"""On-device NMS with static shapes.

Replaces the reference's CUDA bitmask NMS (det3d/ops/iou3d_nms, wrapper
det3d/core/bbox/box_torch_ops.py:449 ``rotate_nms_pcdet``) and the numba
``circle_nms`` (det3d/core/utils/circle_nms_jit.py:5).

Design — blocked greedy, exact: candidates are score-sorted. Each round
takes the top ``BLOCK`` still-alive candidates, resolves them against each
other with a small sequential pass (the top-scoring alive candidate is
always kept, so every round makes progress), then suppresses the whole
candidate set with one (BLOCK, K) overlap matrix. This reproduces classic
greedy NMS exactly — the CUDA kernel's 64-box bitmask tiling is the same
recurrence — but needs ~K/BLOCK loop iterations instead of K, which is what
matters on TPU where per-iteration latency, not FLOPs, dominates.

Outputs are fixed-size index arrays padded with -1; callers carry validity
masks instead of dynamic shapes.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .nms_suppression import suppression_matrix

_BLOCK = 64


def _greedy_within_block(valid, sup_cc):
    """Sequential greedy over one block: keep_i unless an earlier kept
    candidate suppresses it. valid: (B,) bool; sup_cc: (B, B) bool."""
    block = valid.shape[0]

    def step(i, keep):
        suppressed = jnp.any(keep & sup_cc[:, i] & (jnp.arange(block) < i))
        return keep.at[i].set(valid[i] & ~suppressed)

    return jax.lax.fori_loop(0, block, step, jnp.zeros(block, bool))


def _blocked_nms(boxes, scores, suppress_matrix_fn, post_max_size: int):
    """Generic blocked greedy NMS.

    boxes: (K, D) score-sorted is NOT required (we top_k internally);
    padded entries must carry scores = -inf.
    suppress_matrix_fn(cand_boxes (B, D), all_boxes (K, D)) -> (B, K) bool.
    """
    k = boxes.shape[0]
    block = min(_BLOCK, k)
    neg_inf = jnp.array(-jnp.inf, scores.dtype)
    # Each round resolves a full block (kept or suppressed), so
    # ceil(k/block) rounds always suffice; the count check usually exits
    # far earlier. The cap only bounds the worst case.
    max_rounds = -(-k // block)

    def cond(state):
        alive, kept, count, rounds = state
        return (count < post_max_size) & jnp.any(alive) & (rounds < max_rounds)

    def body(state):
        alive, kept, count, rounds = state
        cand_scores = jnp.where(alive, scores, neg_inf)
        top_s, top_i = jax.lax.top_k(cand_scores, block)
        cand_valid = top_s > neg_inf
        cand_boxes = boxes[top_i]

        sup = suppress_matrix_fn(cand_boxes, cand_boxes)  # (B, B)
        keep_c = _greedy_within_block(cand_valid, sup)

        # all processed candidates are resolved (kept or suppressed in-block)
        onehot = (top_i[:, None] == jnp.arange(k)[None, :]) & cand_valid[:, None]
        kept = kept | jnp.any(onehot & keep_c[:, None], axis=0)
        alive = alive & ~jnp.any(onehot, axis=0)

        # kept candidates suppress the rest of the field
        sup_all = suppress_matrix_fn(cand_boxes, boxes)  # (B, K)
        killed = jnp.any(sup_all & keep_c[:, None], axis=0)
        alive = alive & ~killed
        return alive, kept, count + jnp.sum(keep_c), rounds + 1

    alive0 = scores > neg_inf
    kept0 = jnp.zeros(k, bool)
    _, kept, _, _ = jax.lax.while_loop(
        cond, body, (alive0, kept0, jnp.int32(0), jnp.int32(0))
    )

    final_scores = jnp.where(kept, scores, neg_inf)
    sel_scores, sel = jax.lax.top_k(final_scores, min(post_max_size, k))
    sel = jnp.where(sel_scores > neg_inf, sel, -1)
    if sel.shape[0] < post_max_size:
        sel = jnp.pad(sel, (0, post_max_size - sel.shape[0]), constant_values=-1)
    return sel.astype(jnp.int32)


@partial(jax.jit, static_argnames=("iou_threshold", "post_max_size"))
def rotated_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
    post_max_size: int,
) -> jnp.ndarray:
    """Greedy rotated-BEV NMS.

    boxes: (K, 5) rects (cx, cy, dx, dy, heading); padded entries must carry
    ``scores = -inf``. Returns (post_max_size,) int32 indices, -1 padded.
    """

    def suppress(cand, others):
        return suppression_matrix(cand, others, iou_threshold)

    return _blocked_nms(boxes, scores, suppress, post_max_size)


@partial(jax.jit, static_argnames=("min_radius", "post_max_size"))
def circle_nms(
    centers: jnp.ndarray,
    scores: jnp.ndarray,
    min_radius: float,
    post_max_size: int,
) -> jnp.ndarray:
    """Center-distance NMS (reference circle_nms_jit.py:5-28)."""
    thresh2 = jnp.asarray(min_radius, centers.dtype) ** 2

    def suppress(cand, others):
        d2 = jnp.sum((cand[:, None, :] - others[None, :, :]) ** 2, axis=-1)
        return d2 < thresh2

    return _blocked_nms(centers, scores, suppress, post_max_size)
