"""Rotated BEV box IoU in pure JAX.

TPU-native replacement for the reference's CUDA rotated-overlap kernels
(det3d/ops/iou3d_nms/src/iou3d_nms_kernel.cu, det3d/core/iou3d). The CUDA
code clips polygons with per-pair scalar loops; scalar loops, scatters,
small sorts AND rolls along a materialized ring axis all map poorly onto the
TPU, so the rect∩rect area here is a Sutherland–Hodgman clip where the
polygon ring lives in a *Python list of per-slot coordinate arrays*:

- ring rotation / interleaving are list operations — free at trace time;
- every numeric op is elementwise over the broadcasted pair shape, so XLA
  fuses the whole clip into a few VPU kernels with no ring-axis
  materialization in HBM;
- duplicate vertices are allowed (zero-length edges clip correctly), so a
  clip just doubles the slot list (4 -> 8 -> 16 -> 32 -> 64) and invalid
  slots are refilled from their circular predecessor with log2(n) selects;
- area = shoelace over the final slot list (duplicates contribute 0).

Boxes are BEV rects ``(cx, cy, dx, dy, heading)`` — pcdet layout, i.e.
columns [0, 1, 3, 4, 6] of a 7-dof box.
"""
from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


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


def _corner_slots_cols(cx, cy, dx, dy, ang):
    """Rect params as broadcastable arrays -> 4 CCW corner slot lists."""
    c, s = jnp.cos(ang), jnp.sin(ang)
    xs, ys = [], []
    for ux, uy in ((1, 1), (-1, 1), (-1, -1), (1, -1)):
        lx = 0.5 * ux * dx
        ly = 0.5 * uy * dy
        xs.append(cx + lx * c - ly * s)
        ys.append(cy + lx * s + ly * c)
    return xs, ys


def _corner_slots(boxes):
    """(..., 5) rects -> 4 CCW corner slots as ([x0..x3], [y0..y3]) lists."""
    return _corner_slots_cols(*(boxes[..., i] for i in range(5)))


def _fill_from_predecessor(xs, ys, valid):
    """Refill invalid slots from the nearest valid circular predecessor."""
    n = len(xs)
    k = 1
    while k < n:
        nxs, nys, nvalid = [], [], []
        for i in range(n):
            j = (i - k) % n
            take = (~valid[i]) & valid[j]
            nxs.append(jnp.where(take, xs[j], xs[i]))
            nys.append(jnp.where(take, ys[j], ys[i]))
            nvalid.append(valid[i] | valid[j])
        xs, ys, valid = nxs, nys, nvalid
        k *= 2
    return xs, ys, valid


def _clip_halfplane(xs, ys, alive, ax, ay, bx, by):
    """Clip duplicate-ring polygons by the half-plane left of a->b."""
    n = len(xs)
    ex, ey = bx - ax, by - ay
    d = [ex * (ys[i] - ay) - ey * (xs[i] - ax) for i in range(n)]

    oxs, oys, ovalid = [], [], []
    for i in range(n):
        j = (i + 1) % n
        cur_in = d[i] >= 0
        nxt_in = d[j] >= 0
        crossing = cur_in != nxt_in

        denom = d[i] - d[j]
        t = d[i] / jnp.where(jnp.abs(denom) < _EPS, _EPS, denom)
        ix = xs[i] + t * (xs[j] - xs[i])
        iy = ys[i] + t * (ys[j] - ys[i])

        # even slot: the current vertex if inside, else the entry point
        oxs.append(jnp.where(cur_in, xs[i], ix))
        oys.append(jnp.where(cur_in, ys[i], iy))
        ovalid.append(cur_in | crossing)
        # odd slot: the exit point when leaving the half-plane
        oxs.append(ix)
        oys.append(iy)
        ovalid.append(cur_in & crossing)

    any_valid = ovalid[0]
    for v in ovalid[1:]:
        any_valid = any_valid | v
    alive = alive & any_valid
    oxs, oys, _ = _fill_from_predecessor(oxs, oys, ovalid)
    return oxs, oys, alive


def rotated_intersection_area(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """Elementwise BEV intersection areas for broadcastable (..., 5) rects."""
    shape = jnp.broadcast_shapes(boxes_a.shape[:-1], boxes_b.shape[:-1])
    boxes_a = jnp.broadcast_to(boxes_a, shape + (5,))
    boxes_b = jnp.broadcast_to(boxes_b, shape + (5,))

    xs, ys = _corner_slots(boxes_a)
    bxs, bys = _corner_slots(boxes_b)
    alive = jnp.ones(shape, bool)
    for i in range(4):
        j = (i + 1) % 4
        xs, ys, alive = _clip_halfplane(xs, ys, alive, bxs[i], bys[i], bxs[j], bys[j])

    n = len(xs)
    area2 = None
    for i in range(n):
        j = (i + 1) % n
        term = xs[i] * ys[j] - xs[j] * ys[i]
        area2 = term if area2 is None else area2 + term
    area = 0.5 * jnp.abs(area2)
    return jnp.where(alive, area, 0.0)


def rotated_overlap_1_to_n(box: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    """BEV intersection areas of one (5,) box with (N, 5) boxes."""
    return rotated_intersection_area(box[None, :], boxes)


def rotated_iou_1_to_n(box: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    inter = rotated_overlap_1_to_n(box, boxes)
    area_a = box[2] * box[3]
    area_b = boxes[:, 2] * boxes[:, 3]
    return inter / jnp.maximum(area_a + area_b - inter, _EPS)


def rotated_iou_matrix(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """(N, 5) x (M, 5) -> (N, M) BEV IoU matrix."""
    inter = rotated_intersection_area(boxes_a[:, None, :], boxes_b[None, :, :])
    area_a = (boxes_a[:, 2] * boxes_a[:, 3])[:, None]
    area_b = (boxes_b[:, 2] * boxes_b[:, 3])[None, :]
    return inter / jnp.maximum(area_a + area_b - inter, _EPS)
