"""Suppression-matrix computation for blocked NMS.

Computes ``iou(cand_i, other_j) > thresh`` for a block of candidates against
the candidate field — the inner product of blocked greedy NMS (ops/nms.py).
Replaces det3d/ops/iou3d_nms/src/iou3d_nms_kernel.cu:267's 64-box bitmask
tiling.

Implementation note (TPU layout): the Sutherland–Hodgman ring lives in
arrays shaped (slots, 2, B, K) — pair dimensions minor, ring dimensions
major — so every elementwise op works on well-tiled (B, K) planes and ring
rotation is a major-axis roll that XLA handles without relayout. A fully
unrolled Pallas kernel was tried and is numerically identical but blows up
Mosaic compile time (thousands of ops in one body); revisit with a compacted
ring if this ever dominates again.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_EPS = 1e-8


def _corners_sm(boxes):
    """(..., 5) -> (4, 2, ...) CCW corners, slot-major layout."""
    cx, cy, dx, dy, ang = (boxes[..., i] for i in range(5))
    c, s = jnp.cos(ang), jnp.sin(ang)
    xs, ys = [], []
    for ux, uy in ((1, 1), (-1, 1), (-1, -1), (1, -1)):
        lx = 0.5 * ux * dx
        ly = 0.5 * uy * dy
        xs.append(cx + lx * c - ly * s)
        ys.append(cy + lx * s + ly * c)
    return jnp.stack([jnp.stack(xs), jnp.stack(ys)], axis=1)  # (4, 2, ...)


def _fill_sm(verts, valid):
    """Fill invalid slots from circular predecessor. verts (n,2,...), valid (n,...)."""
    n = verts.shape[0]
    k = 1
    while k < n:
        pv = jnp.roll(verts, k, axis=0)
        pk = jnp.roll(valid, k, axis=0)
        take = (~valid) & pk
        verts = jnp.where(take[:, None], pv, verts)
        valid = valid | pk
        k *= 2
    return verts, valid


def _clip_sm(verts, alive, a, b):
    """Clip rings (n,2,...) by half-plane left of a->b (each (2,...))."""
    nxt = jnp.roll(verts, -1, axis=0)
    ex = b[0] - a[0]
    ey = b[1] - a[1]
    d_cur = ex * (verts[:, 1] - a[1]) - ey * (verts[:, 0] - a[0])  # (n, ...)
    d_nxt = ex * (nxt[:, 1] - a[1]) - ey * (nxt[:, 0] - a[0])
    cur_in = d_cur >= 0
    crossing = cur_in != (d_nxt >= 0)

    denom = d_cur - d_nxt
    t = d_cur / jnp.where(jnp.abs(denom) < _EPS, _EPS, denom)
    inter = verts + t[:, None] * (nxt - verts)

    even = jnp.where(cur_in[:, None], verts, inter)
    even_valid = cur_in | crossing
    odd = inter
    odd_valid = cur_in & crossing

    n = verts.shape[0]
    out = jnp.concatenate([even, odd], axis=0)  # ring order: interleave below
    valid = jnp.concatenate([even_valid, odd_valid], axis=0)
    # interleave [e0 o0 e1 o1 ...] via index permutation on the static axis
    perm = jnp.arange(2 * n).reshape(2, n).T.reshape(-1)
    out = out[perm]
    valid = valid[perm]

    alive = alive & jnp.any(valid, axis=0)
    out, _ = _fill_sm(out, valid)
    return out, alive


def _intersection_area_sm(boxes_a, boxes_b):
    """Elementwise intersection areas; inputs broadcastable (..., 5)."""
    shape = jnp.broadcast_shapes(boxes_a.shape[:-1], boxes_b.shape[:-1])
    boxes_a = jnp.broadcast_to(boxes_a, shape + (5,))
    boxes_b = jnp.broadcast_to(boxes_b, shape + (5,))
    verts = _corners_sm(boxes_a)   # (4, 2, ...)
    cb = _corners_sm(boxes_b)
    alive = jnp.ones(shape, bool)
    for i in range(4):
        j = (i + 1) % 4
        verts, alive = _clip_sm(verts, alive, cb[i], cb[j])

    nxt = jnp.roll(verts, -1, axis=0)
    cross = verts[:, 0] * nxt[:, 1] - verts[:, 1] * nxt[:, 0]
    area = 0.5 * jnp.abs(jnp.sum(cross, axis=0))
    return jnp.where(alive, area, 0.0)


@functools.partial(jax.jit, static_argnames=("thresh",))
def suppression_matrix(cand: jnp.ndarray, others: jnp.ndarray, thresh: float) -> jnp.ndarray:
    """cand (B, 5), others (K, 5) -> (B, K) bool suppression mask."""
    inter = _intersection_area_sm(cand[:, None, :], others[None, :, :])
    area_a = (cand[:, 2] * cand[:, 3])[:, None]
    area_b = (others[:, 2] * others[:, 3])[None, :]
    iou = inter / jnp.maximum(area_a + area_b - inter, _EPS)
    return iou > thresh
