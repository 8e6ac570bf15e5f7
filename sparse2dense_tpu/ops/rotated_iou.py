"""Rotated BEV box IoU in pure JAX.

TPU-native replacement for the reference's CUDA rotated-overlap kernels
(det3d/ops/iou3d_nms/src/iou3d_nms_kernel.cu, det3d/core/iou3d). Instead of a
per-pair scalar kernel we clip convex polygons with fixed-size vertex buffers
(Sutherland–Hodgman, max 8 vertices for rect∩rect) so everything vmaps and
runs on the VPU with static shapes.

Boxes are BEV rects ``(cx, cy, dx, dy, heading)`` — pcdet layout, i.e. columns
[0, 1, 3, 4, 6] of a 7-dof box.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8
_MAX_VERTS = 8  # rect clipped by 4 half-planes has at most 4 + 4 vertices


def box_to_corners(boxes: jnp.ndarray) -> jnp.ndarray:
    """(..., 5) rect params -> (..., 4, 2) CCW corners."""
    cx, cy, dx, dy, ang = jnp.moveaxis(boxes, -1, 0)
    c, s = jnp.cos(ang), jnp.sin(ang)
    # CCW in local frame: (+,+), (-,+), (-,-), (+,-)
    lx = jnp.stack([dx, -dx, -dx, dx], axis=-1) * 0.5
    ly = jnp.stack([dy, dy, -dy, -dy], axis=-1) * 0.5
    gx = cx[..., None] + lx * c[..., None] - ly * s[..., None]
    gy = cy[..., None] + lx * s[..., None] + ly * c[..., None]
    return jnp.stack([gx, gy], axis=-1)


def _clip_polygon(verts, count, a, b):
    """Clip polygon (verts: (8,2), count valid) by half-plane left of a->b."""
    edge = b - a
    # signed distance > 0 means inside (left of directed edge, CCW polygon)
    d = edge[0] * (verts[:, 1] - a[1]) - edge[1] * (verts[:, 0] - a[0])

    idx = jnp.arange(_MAX_VERTS)
    nxt = jnp.where(idx + 1 >= count, 0, idx + 1)
    d_next = d[nxt]
    v_next = verts[nxt]

    valid = idx < count
    cur_in = d >= 0
    nxt_in = d_next >= 0

    emit_cur = valid & cur_in
    crossing = valid & (cur_in != nxt_in)

    t = d / jnp.where(jnp.abs(d - d_next) < _EPS, _EPS, d - d_next)
    inter = verts + t[:, None] * (v_next - verts)

    n_emit = emit_cur.astype(jnp.int32) + crossing.astype(jnp.int32)
    offset = jnp.cumsum(n_emit) - n_emit
    pos_cur = jnp.where(emit_cur, offset, _MAX_VERTS)
    pos_int = jnp.where(crossing, offset + emit_cur.astype(jnp.int32), _MAX_VERTS)

    out = jnp.zeros_like(verts)
    out = out.at[pos_cur].set(verts, mode="drop")
    out = out.at[pos_int].set(inter, mode="drop")
    new_count = jnp.sum(n_emit)

    # pad tail slots with the last valid vertex so shoelace closes cleanly
    last = out[jnp.maximum(new_count - 1, 0)]
    out = jnp.where((idx < new_count)[:, None], out, last[None, :])
    return out, new_count


def _pair_intersection_area(corners_a, corners_b):
    """Intersection area of two CCW quads, each (4, 2)."""
    verts = jnp.zeros((_MAX_VERTS, 2), corners_a.dtype)
    verts = verts.at[:4].set(corners_a)
    # pad with last vertex for the shoelace trick
    verts = verts.at[4:].set(corners_a[3][None, :])
    count = jnp.int32(4)

    def clip_step(i, carry):
        v, c = carry
        a = corners_b[i]
        b = corners_b[(i + 1) % 4]
        return _clip_polygon(v, c, a, b)

    verts, count = jax.lax.fori_loop(0, 4, clip_step, (verts, count))

    nxt = jnp.roll(verts, -1, axis=0)
    cross = verts[:, 0] * nxt[:, 1] - verts[:, 1] * nxt[:, 0]
    area = 0.5 * jnp.abs(jnp.sum(cross))
    return jnp.where(count >= 3, area, 0.0)


def rotated_overlap_1_to_n(box: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    """BEV intersection areas of one (5,) box with (N, 5) boxes."""
    ca = box_to_corners(box)
    cb = box_to_corners(boxes)
    return jax.vmap(lambda b: _pair_intersection_area(ca, b))(cb)


def rotated_iou_1_to_n(box: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    inter = rotated_overlap_1_to_n(box, boxes)
    area_a = box[2] * box[3]
    area_b = boxes[:, 2] * boxes[:, 3]
    return inter / jnp.maximum(area_a + area_b - inter, _EPS)


def rotated_iou_matrix(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """(N, 5) x (M, 5) -> (N, M) BEV IoU matrix."""
    return jax.vmap(lambda a: rotated_iou_1_to_n(a, boxes_b))(boxes_a)
