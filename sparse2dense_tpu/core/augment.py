"""Global augmentations over gt boxes + any number of point streams.

Rebuild of the reference's det3d/core/sampler/preprocess.py augmentation
family. The reference duplicates every transform as ``f(boxes, points)`` and
``f_(boxes, points, dense_points, completion_points)`` (:790, :859, :902,
:1032) to keep the distillation streams coherent; here each transform takes a
*list* of point arrays and applies the identical transform to all of them,
which covers both call shapes.

Also hosts noise_per_object_ (per-box jitter for GT-AUG placement) and
box_collision_test (reference :214, :562, :923) in vectorized NumPy.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from . import box_np_ops


def rotation_points_single_angle(points, angle, axis=2):
    """(N, 3) points rotated by a scalar angle about an axis
    (reference box_np_ops.py:182-209)."""
    sin, cos = np.sin(angle), np.cos(angle)
    if axis == 2:
        rot = np.array([[cos, -sin, 0], [sin, cos, 0], [0, 0, 1]], points.dtype)
    elif axis == 1:
        rot = np.array([[cos, 0, -sin], [0, 1, 0], [sin, 0, cos]], points.dtype)
    else:
        rot = np.array([[1, 0, 0], [0, cos, -sin], [0, sin, cos]], points.dtype)
    return points @ rot.T


def random_flip_both(gt_boxes, point_streams: List[np.ndarray],
                     probability=0.5, flip_coor=None,
                     rng: Optional[np.random.RandomState] = None):
    """x- and y-axis flips (reference preprocess.py:828-900)."""
    rng = rng or np.random
    if rng.rand() < probability:  # flip about x axis (negate y)
        gt_boxes[:, 1] = -gt_boxes[:, 1]
        gt_boxes[:, -1] = -gt_boxes[:, -1] + np.pi
        for p in point_streams:
            p[:, 1] = -p[:, 1]
        if gt_boxes.shape[1] > 7:
            gt_boxes[:, 7] = -gt_boxes[:, 7]
    if rng.rand() < probability:  # flip about y axis (negate x)
        if flip_coor is None:
            gt_boxes[:, 0] = -gt_boxes[:, 0]
            for p in point_streams:
                p[:, 0] = -p[:, 0]
        else:
            gt_boxes[:, 0] = flip_coor * 2 - gt_boxes[:, 0]
            for p in point_streams:
                p[:, 0] = flip_coor * 2 - p[:, 0]
        gt_boxes[:, -1] = -gt_boxes[:, -1] + 2 * np.pi
        if gt_boxes.shape[1] > 7:
            gt_boxes[:, 6] = -gt_boxes[:, 6]
    return gt_boxes, point_streams


def global_rotation(gt_boxes, point_streams: List[np.ndarray],
                    rotation=np.pi / 4,
                    rng: Optional[np.random.RandomState] = None):
    """(reference preprocess.py:777-814)."""
    rng = rng or np.random
    if not isinstance(rotation, (list, tuple)):
        rotation = [-rotation, rotation]
    angle = rng.uniform(rotation[0], rotation[1])
    for p in point_streams:
        p[:, :3] = rotation_points_single_angle(p[:, :3], angle, axis=2)
    gt_boxes[:, :3] = rotation_points_single_angle(gt_boxes[:, :3], angle, axis=2)
    if gt_boxes.shape[1] > 7:
        vel = np.hstack([gt_boxes[:, 6:8], np.zeros((gt_boxes.shape[0], 1))])
        gt_boxes[:, 6:8] = rotation_points_single_angle(vel, angle, axis=2)[:, :2]
    gt_boxes[:, -1] += angle
    return gt_boxes, point_streams


def global_scaling(gt_boxes, point_streams: List[np.ndarray],
                   min_scale=0.95, max_scale=1.05,
                   rng: Optional[np.random.RandomState] = None):
    """(reference preprocess.py:902-908; note the reference scales all box
    columns but the rotation, including velocity)."""
    rng = rng or np.random
    s = rng.uniform(min_scale, max_scale)
    for p in point_streams:
        p[:, :3] *= s
    gt_boxes[:, :-1] *= s
    return gt_boxes, point_streams


def global_translate(gt_boxes, point_streams: List[np.ndarray],
                     noise_translate_std=0,
                     rng: Optional[np.random.RandomState] = None):
    """(reference preprocess.py:1007-1057)."""
    rng = rng or np.random
    if not isinstance(noise_translate_std, (list, tuple, np.ndarray)):
        noise_translate_std = [noise_translate_std] * 3
    if all(e == 0 for e in noise_translate_std):
        return gt_boxes, point_streams
    t = np.array([rng.normal(0, s) for s in noise_translate_std],
                 gt_boxes.dtype)
    for p in point_streams:
        p[:, :3] += t
    gt_boxes[:, :3] += t
    return gt_boxes, point_streams


# ------------------------------------------------------------ collision test

def box_collision_test(boxes, qboxes):
    """(N, 5) x (K, 5) BEV rotated-box overlap test (reference numba kernel
    core/sampler/preprocess.py:923-1005). Exact SAT on the 2D corner
    polygons, vectorized."""
    n, k = boxes.shape[0], qboxes.shape[0]
    if n == 0 or k == 0:
        return np.zeros((n, k), dtype=bool)
    c1 = box_np_ops.center_to_corner_box2d(boxes[:, :2], boxes[:, 2:4],
                                           boxes[:, 4])  # (N, 4, 2)
    c2 = box_np_ops.center_to_corner_box2d(qboxes[:, :2], qboxes[:, 2:4],
                                           qboxes[:, 4])  # (K, 4, 2)

    def axes_of(corners):
        e = np.roll(corners, -1, axis=1) - corners  # (M, 4, 2)
        ax = np.stack([-e[..., 1], e[..., 0]], axis=-1)
        norm = np.linalg.norm(ax, axis=-1, keepdims=True)
        return ax / np.maximum(norm, 1e-9)

    a1, a2 = axes_of(c1), axes_of(c2)  # (N,4,2), (K,4,2)

    # separating-axis test over the 8 candidate axes (4 per box)
    sep = np.zeros((n, k), dtype=bool)
    for owner, axes, ca, cb in ((0, a1, c1, c2), (1, a2, c1, c2)):
        for i in range(4):
            if owner == 0:
                ax = axes[:, i, :]  # (N, 2)
                pa = np.einsum("ncd,nd->nc", ca, ax)  # (N, 4)
                pb = np.einsum("kcd,nd->nkc", cb, ax)  # (N, K, 4)
                amin, amax = pa.min(1)[:, None], pa.max(1)[:, None]
                bmin, bmax = pb.min(2), pb.max(2)
            else:
                ax = axes[:, i, :]  # (K, 2)
                pa = np.einsum("ncd,kd->nkc", ca, ax)  # (N, K, 4)
                pb = np.einsum("kcd,kd->kc", cb, ax)  # (K, 4)
                amin, amax = pa.min(2), pa.max(2)
                bmin, bmax = pb.min(1)[None, :], pb.max(1)[None, :]
            sep |= (amax < bmin) | (bmax < amin)
    return ~sep
