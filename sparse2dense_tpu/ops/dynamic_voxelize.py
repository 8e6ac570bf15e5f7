"""On-device dynamic voxelization (the inference fast path).

The reference voxelizes on the CPU in dataloader workers (numba
point_cloud_ops.py:7-109) because spconv needs a ragged voxel list. On TPU we
keep everything static and on device:

- ``dynamic_voxelize_mean``: points -> (features, coords, valid) rows of
  per-voxel MEAN features with a fixed voxel budget. Implemented as
  sort-by-cell + segment reduction + deterministic compaction, all XLA sort /
  scatter primitives. Row order is ascending cell id (grid-linear) — a
  different enumeration than the host voxelizer's first-appearance order, but
  the same set, and every consumer here is order-independent. Overflow drops
  the highest cell ids, mirroring ops/sparse_conv.downsample_active_set.
  Replaces VoxelFeatureExtractorV3(mean) + host voxelizer for inference.

- ``dynamic_pillar_encode``: per-POINT pillar decoration (cluster/center
  offsets) computed with segment means — the PFN then runs per point and a
  segment-max scatters straight into the BEV canvas. This skips the (V, P, C)
  slot tensor entirely: ~N point rows instead of V*P slots of mostly padding.

Both paths differ from hard voxelization in that NO points are dropped by the
max_points-per-voxel cap (the mean/max is over all points in the cell). For
mean features the cap only matters when a cell overflows (rare at Waymo
resolution); parity tests cover the uncapped case exactly.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def point_cell_ids(points, valid, voxel_size, pc_range, grid_size):
    """Per-point linear cell id in zyx-major order (matching
    ops/sparse_conv.ravel_coords); invalid/out-of-range points -> big sentinel."""
    vs = jnp.asarray(voxel_size, points.dtype)
    lo = jnp.asarray(pc_range[:3], points.dtype)
    gx, gy, gz = int(grid_size[0]), int(grid_size[1]), int(grid_size[2])
    cell = jnp.floor((points[:, :3] - lo) / vs).astype(jnp.int32)
    ok = valid & jnp.all(cell >= 0, axis=1) & (
        (cell[:, 0] < gx) & (cell[:, 1] < gy) & (cell[:, 2] < gz)
    )
    lin = (cell[:, 2] * gy + cell[:, 1]) * gx + cell[:, 0]  # z-major zyx
    sentinel = gx * gy * gz
    return jnp.where(ok, lin, sentinel), cell, ok


def dynamic_voxelize_mean(
    points: jnp.ndarray,
    valid: jnp.ndarray,
    voxel_size: Sequence[float],
    pc_range: Sequence[float],
    grid_size: Sequence[int],
    max_voxels: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """points (N, C) with validity mask -> (features (V, C) means,
    coords (V, 3) zyx int32 with -1 padding, valid (V,))."""
    n, c = points.shape
    gx, gy, gz = (int(g) for g in grid_size)
    lin, _, ok = point_cell_ids(points, valid, voxel_size, pc_range, grid_size)

    order = jnp.argsort(lin)
    slin = lin[order]
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), slin[1:] != slin[:-1]]
    ) & (slin < gx * gy * gz)
    slot = jnp.cumsum(is_start.astype(jnp.int32)) - 1  # voxel row per point
    slot = jnp.where(slin < gx * gy * gz, slot, max_voxels)
    slot = jnp.minimum(slot, max_voxels)  # overflow rows collapse to the dump row

    spoints = points[order]
    sums = jnp.zeros((max_voxels + 1, c), points.dtype).at[slot].add(
        spoints, mode="drop"
    )[:max_voxels]
    counts = jnp.zeros((max_voxels + 1,), jnp.int32).at[slot].add(
        1, mode="drop"
    )[:max_voxels]
    row_lin = jnp.full((max_voxels + 1,), -1, jnp.int32).at[slot].max(
        slin, mode="drop"
    )[:max_voxels]

    out_valid = counts > 0
    feats = sums / jnp.maximum(counts, 1).astype(points.dtype)[:, None]
    feats = feats * out_valid[:, None].astype(points.dtype)
    safe = jnp.maximum(row_lin, 0)
    zc = safe // (gy * gx)
    yc = (safe // gx) % gy
    xc = safe % gx
    coords = jnp.stack([zc, yc, xc], axis=-1)
    coords = jnp.where(out_valid[:, None], coords, -1)
    return feats, coords, out_valid


def dynamic_pillar_features(points, valid, voxel_size, pc_range, grid_size):
    """Per-point decorated pillar features (the PillarFeatureNet decoration,
    reference pillar_encoder.py:121-141, computed per point with segment
    means): [raw(C), cluster offset(3), center offset(2)] -> (N, C+5),
    plus the per-point flat BEV index (ny*nx sentinel for invalid)."""
    n, c = points.shape
    gx, gy = int(grid_size[0]), int(grid_size[1])
    vs = jnp.asarray(voxel_size, points.dtype)
    lo = jnp.asarray(pc_range[:3], points.dtype)
    cell = jnp.floor((points[:, :3] - lo) / vs).astype(jnp.int32)
    ok = valid & jnp.all(cell[:, :2] >= 0, axis=1) & (
        (cell[:, 0] < gx) & (cell[:, 1] < gy)
    )
    flat = cell[:, 1] * gx + cell[:, 0]  # y * nx + x
    flat = jnp.where(ok, flat, gx * gy)

    ncell = gx * gy
    sums = jnp.zeros((ncell + 1, 3), points.dtype).at[flat].add(
        points[:, :3] * ok[:, None], mode="drop"
    )
    counts = jnp.zeros((ncell + 1,), jnp.int32).at[flat].add(
        ok.astype(jnp.int32), mode="drop"
    )
    means = sums / jnp.maximum(counts, 1).astype(points.dtype)[:, None]
    f_cluster = points[:, :3] - means[jnp.minimum(flat, ncell)]

    cx = (cell[:, 0].astype(points.dtype) + 0.5) * vs[0] + lo[0]
    cy = (cell[:, 1].astype(points.dtype) + 0.5) * vs[1] + lo[1]
    f_center = jnp.stack([points[:, 0] - cx, points[:, 1] - cy], axis=-1)

    feats = jnp.concatenate([points, f_cluster, f_center], axis=-1)
    feats = feats * ok[:, None].astype(points.dtype)
    return feats, flat, ok


def scatter_max_to_canvas(point_feats, flat, ny, nx):
    """(N, C) per-point features -> (ny, nx, C) via segment max (the PFN
    max-pool + PointPillarsScatter fused)."""
    c = point_feats.shape[-1]
    canvas = jnp.zeros((ny * nx + 1, c), point_feats.dtype).at[flat].max(
        point_feats, mode="drop"
    )[: ny * nx]
    return canvas.reshape(ny, nx, c)
