"""Rotated 3D box IoU on device.

TPU-native replacement for the reference's iou3d CUDA kernels
(det3d/ops/iou3d_nms/src/iou3d_nms_kernel.cu `boxes_iou3d_gpu`): BEV rotated
intersection (Sutherland-Hodgman clip from ops/rotated_iou.py) times vertical
overlap, over the union of volumes. Boxes are (x, y, z, w, l, h, yaw) with z
the gravity center.
"""
from __future__ import annotations

import jax.numpy as jnp

from .rotated_iou import rotated_intersection_area

_EPS = 1e-8


def boxes_iou3d(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """(N, 7) x (M, 7) -> (N, M) 3D IoU matrix."""
    bev_a = boxes_a[:, jnp.array([0, 1, 3, 4, 6])]
    bev_b = boxes_b[:, jnp.array([0, 1, 3, 4, 6])]
    inter_bev = rotated_intersection_area(bev_a[:, None, :], bev_b[None, :, :])

    za1 = boxes_a[:, 2] - boxes_a[:, 5] / 2
    za2 = boxes_a[:, 2] + boxes_a[:, 5] / 2
    zb1 = boxes_b[:, 2] - boxes_b[:, 5] / 2
    zb2 = boxes_b[:, 2] + boxes_b[:, 5] / 2
    inter_z = jnp.maximum(
        jnp.minimum(za2[:, None], zb2[None, :])
        - jnp.maximum(za1[:, None], zb1[None, :]),
        0.0,
    )
    inter = inter_bev * inter_z
    vol_a = (boxes_a[:, 3] * boxes_a[:, 4] * boxes_a[:, 5])[:, None]
    vol_b = (boxes_b[:, 3] * boxes_b[:, 4] * boxes_b[:, 5])[None, :]
    return inter / jnp.maximum(vol_a + vol_b - inter, _EPS)
