"""Hard voxelization (host side).

Reproduces the reference's numba first-come-first-serve semantics
(det3d/ops/point_cloud/point_cloud_ops.py:7-109) with vectorized NumPy:

- a point is dropped if any of its xyz cells falls outside the grid;
- voxels are indexed in order of *first appearance* along the point order;
- once ``max_voxels`` distinct voxels exist, points of new voxels are dropped;
- within a voxel only the first ``max_points`` points (arrival order) are kept;
- with ``reverse_index`` (the det3d default) coordinates are returned zyx.

This runs in the input pipeline. The on-device fast path for inference is
``sparse2dense_tpu.ops.dynamic_voxelize`` which needs no ragged shapes at all.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np


def points_to_voxel_native(points, voxel_size, coors_range, max_points,
                           max_voxels):
    """C++ fast path (sparse2dense_tpu/csrc/voxelizer.cpp) — identical
    first-come-first-serve semantics; returns None if the native library is
    unavailable."""
    import ctypes

    from ..csrc import load

    lib = load()
    if lib is None:
        return None
    points = np.ascontiguousarray(points, dtype=np.float32)
    n, c = points.shape
    vs = np.ascontiguousarray(voxel_size, dtype=np.float32)
    cr = np.ascontiguousarray(coors_range, dtype=np.float32)
    voxels = np.zeros((max_voxels, max_points, c), np.float32)
    coords = np.zeros((max_voxels, 3), np.int32)
    num_points = np.zeros((max_voxels,), np.int32)
    ptr = lambda a: a.ctypes.data_as(ctypes.c_void_p)
    m = lib.points_to_voxel_fcfs(
        ptr(points), ctypes.c_int64(n), ctypes.c_int64(c),
        ptr(vs), ptr(cr),
        ctypes.c_int64(max_points), ctypes.c_int64(max_voxels),
        ptr(voxels), ptr(coords), ptr(num_points),
    )
    return voxels[:m], coords[:m], num_points[:m]


def points_to_voxel(
    points: np.ndarray,
    voxel_size,
    coors_range,
    max_points: int = 35,
    reverse_index: bool = True,
    max_voxels: int = 20000,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Voxelize (N, >=3) points. Returns (voxels, coords, num_points_per_voxel).

    voxels: (M, max_points, C) float, zero padded. coords: (M, 3) int32,
    zyx when reverse_index else xyz. M <= max_voxels.

    Dispatches to the native C++ kernel when built (csrc/voxelizer.cpp),
    falling back to the vectorized NumPy implementation below.
    """
    if reverse_index and np.asarray(points).shape[0] > 0:
        native = points_to_voxel_native(
            points, voxel_size, coors_range, max_points, max_voxels
        )
        if native is not None:
            return native
    points = np.asarray(points)
    voxel_size = np.asarray(voxel_size, dtype=points.dtype)
    coors_range = np.asarray(coors_range, dtype=points.dtype)
    grid_size = np.round((coors_range[3:] - coors_range[:3]) / voxel_size).astype(np.int64)

    if points.shape[0] == 0:
        return (
            np.zeros((0, max_points, points.shape[-1]), dtype=points.dtype),
            np.zeros((0, 3), dtype=np.int32),
            np.zeros((0,), dtype=np.int32),
        )

    # Per-point cell indices; floor matches the reference exactly.
    cell = np.floor((points[:, :3] - coors_range[:3]) / voxel_size).astype(np.int64)
    valid = np.all((cell >= 0) & (cell < grid_size[None, :]), axis=1)
    pts = points[valid]
    cell = cell[valid]
    if pts.shape[0] == 0:
        return (
            np.zeros((0, max_points, points.shape[-1]), dtype=points.dtype),
            np.zeros((0, 3), dtype=np.int32),
            np.zeros((0,), dtype=np.int32),
        )

    # Linear key in x-major order (value irrelevant as long as it is unique).
    keys = (cell[:, 0] * grid_size[1] + cell[:, 1]) * grid_size[2] + cell[:, 2]

    # Voxel ids in order of first appearance.
    _, first_idx, inverse = np.unique(keys, return_index=True, return_inverse=True)
    appearance_rank = np.empty(len(first_idx), dtype=np.int64)
    appearance_rank[np.argsort(first_idx, kind="stable")] = np.arange(len(first_idx))
    voxel_ids = appearance_rank[inverse]

    # Within-voxel arrival rank (vectorized cumcount).
    perm = np.argsort(voxel_ids, kind="stable")
    sorted_vids = voxel_ids[perm]
    n = len(sorted_vids)
    is_start = np.empty(n, dtype=bool)
    is_start[0] = True
    is_start[1:] = sorted_vids[1:] != sorted_vids[:-1]
    group_start = np.maximum.accumulate(np.where(is_start, np.arange(n), 0))
    ranks = np.empty(n, dtype=np.int64)
    ranks[perm] = np.arange(n) - group_start

    keep = (voxel_ids < max_voxels) & (ranks < max_points)
    kept_vids = voxel_ids[keep]
    num_voxels = int(kept_vids.max()) + 1 if kept_vids.size else 0

    voxels = np.zeros((num_voxels, max_points, points.shape[-1]), dtype=points.dtype)
    voxels[kept_vids, ranks[keep]] = pts[keep]
    num_points_per_voxel = np.bincount(kept_vids, minlength=num_voxels).astype(np.int32)

    # coords of each kept voxel, in first-appearance order.
    coords = np.zeros((num_voxels, 3), dtype=np.int32)
    coords[kept_vids] = cell[keep].astype(np.int32)
    if reverse_index:
        coords = coords[:, ::-1]  # xyz -> zyx

    return voxels, coords, num_points_per_voxel


class VoxelGenerator:
    """Config-driven wrapper (reference det3d/core/input/voxel_generator.py:5)."""

    def __init__(self, voxel_size, point_cloud_range, max_num_points, max_voxels=20000):
        point_cloud_range = np.asarray(point_cloud_range, dtype=np.float32)
        voxel_size = np.asarray(voxel_size, dtype=np.float32)
        grid_size = np.round((point_cloud_range[3:] - point_cloud_range[:3]) / voxel_size)
        self._voxel_size = voxel_size
        self._point_cloud_range = point_cloud_range
        self._max_num_points = max_num_points
        self._max_voxels = max_voxels
        self._grid_size = grid_size.astype(np.int64)

    def generate(self, points: np.ndarray, max_voxels: int = None):
        return points_to_voxel(
            points,
            self._voxel_size,
            self._point_cloud_range,
            self._max_num_points,
            True,
            max_voxels if max_voxels is not None else self._max_voxels,
        )

    @property
    def voxel_size(self):
        return self._voxel_size

    @property
    def max_num_points_per_voxel(self):
        return self._max_num_points

    @property
    def point_cloud_range(self):
        return self._point_cloud_range

    @property
    def grid_size(self):
        return self._grid_size
