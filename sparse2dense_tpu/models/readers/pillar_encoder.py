"""Pillar feature encoding, TPU-native.

Functional rebuild of the reference PointPillars reader
(det3d/models/readers/pillar_encoder.py:16-154) on static-shape batched
arrays:

- voxels:      (B, V, P, C) float — zero-padded point features per pillar
- num_points:  (B, V) int32       — valid points per pillar (0 => padded pillar)
- coords:      (B, V, 3) int32    — (z, y, x) cell coords, -1 for padded pillars

Parity notes (deliberate, matching the reference bit-for-bit in spirit):
- decorated features are masked to zero for padded *points*, but BatchNorm
  inside PFN layers still sees those zeros (the reference normalizes over all
  (voxel, point) positions); padded *pillars* are excluded via the BN mask
  since the reference never materializes them;
- the max over points is unmasked, as in the reference (padded points pass
  through linear+BN and can win the max — replicated intentionally).

The (B, V, P, Cin) -> (B, V, P, Cout) linear layers are batched matmuls that
map straight onto the MXU.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..norm import BatchNorm
from ..registry import READERS


class PFNLayer(nn.Module):
    out_channels: int
    last_layer: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, pillar_mask, train: bool):
        units = self.out_channels if self.last_layer else self.out_channels // 2
        x = nn.Dense(units, use_bias=False, name="linear")(x)
        # BN statistics over every (pillar, point) slot of real pillars.
        x = BatchNorm(axis_name=self.axis_name, name="norm")(
            x, mask=pillar_mask[..., None, None], use_running_average=not train
        )
        x = nn.relu(x)
        x_max = jnp.max(x, axis=-2, keepdims=True)  # (B, V, 1, units)
        if self.last_layer:
            return x_max
        rep = jnp.broadcast_to(x_max, x.shape)
        return jnp.concatenate([x, rep], axis=-1)


@READERS.register_module
class PillarFeatureNet(nn.Module):
    num_input_features: int = 4
    num_filters: Sequence[int] = (64,)
    with_distance: bool = False
    voxel_size: Tuple[float, ...] = (0.2, 0.2, 4)
    pc_range: Tuple[float, ...] = (0, -40, -3, 70.4, 40, 1)
    norm_cfg: Optional[dict] = None
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, voxels, num_points, coords, train: bool = False):
        """-> (B, V, num_filters[-1]) pillar features."""
        dtype = voxels.dtype
        np_clamped = jnp.maximum(num_points, 1).astype(dtype)[..., None, None]
        pillar_mask = num_points > 0  # (B, V)

        # offset from the pillar's point centroid
        pts_mean = jnp.sum(voxels[..., :3], axis=-2, keepdims=True) / np_clamped
        f_cluster = voxels[..., :3] - pts_mean

        # offset from the pillar's cell center; coords are (z, y, x)
        vx, vy = self.voxel_size[0], self.voxel_size[1]
        x_off = vx / 2 + self.pc_range[0]
        y_off = vy / 2 + self.pc_range[1]
        cx = coords[..., 2].astype(dtype)[..., None] * vx + x_off
        cy = coords[..., 1].astype(dtype)[..., None] * vy + y_off
        f_center = jnp.stack(
            [voxels[..., 0] - cx, voxels[..., 1] - cy], axis=-1
        )

        feats = [voxels, f_cluster, f_center]
        if self.with_distance:
            feats.append(jnp.linalg.norm(voxels[..., :3], axis=-1, keepdims=True))
        features = jnp.concatenate(feats, axis=-1)

        # zero the decorations of padded points (reference :143-148)
        point_ids = jnp.arange(features.shape[-2])
        point_mask = point_ids[None, None, :] < num_points[..., None]
        features = features * point_mask[..., None].astype(dtype)

        n_layers = len(self.num_filters)
        for i, nf in enumerate(self.num_filters):
            features = PFNLayer(
                out_channels=nf,
                last_layer=(i == n_layers - 1),
                axis_name=self.axis_name,
                name=f"pfn_{i}",
            )(features, pillar_mask, train)

        return features[..., 0, :]  # (B, V, C)


@READERS.register_module
class VoxelFeatureExtractorV3(nn.Module):
    """Mean of points per voxel (reference voxel_encoder.py:9-24)."""

    num_input_features: int = 4
    norm_cfg: Optional[dict] = None

    @nn.compact
    def __call__(self, voxels, num_points, coords=None, train: bool = False):
        denom = jnp.maximum(num_points, 1).astype(voxels.dtype)[..., None]
        return jnp.sum(voxels, axis=-2) / denom  # (B, V, C)
