"""Pillar scatter: sparse pillar features -> dense BEV canvas (NHWC).

Reference: det3d/models/readers/pillar_encoder.py:158-217 loops over the
batch and indexes a (C, nx*ny) canvas. Here it is one XLA scatter with
out-of-bounds drop: padded pillars carry coords = -1, which ``mode='drop'``
discards, so no masks or per-sample loops are needed.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..registry import BACKBONES


def scatter_to_bev(features: jnp.ndarray, coords: jnp.ndarray, ny: int, nx: int) -> jnp.ndarray:
    """features (B, V, C), coords (B, V, 3) zyx int -> (B, ny, nx, C)."""
    b, v, c = features.shape
    flat_idx = coords[..., 1] * nx + coords[..., 2]  # (B, V)
    # coords use -1 padding => flat_idx < 0 => dropped by the scatter
    flat_idx = jnp.where(jnp.any(coords < 0, axis=-1), -1, flat_idx)

    def one(canvas_feats, idx):
        canvas = jnp.zeros((ny * nx, c), features.dtype)
        return canvas.at[idx].set(canvas_feats, mode="drop")

    canvas = jax.vmap(one)(features, flat_idx)
    return canvas.reshape(b, ny, nx, c)


@BACKBONES.register_module
class PointPillarsScatter(nn.Module):
    num_input_features: int = 64
    ds_factor: int = 1
    norm_cfg: Optional[dict] = None
    grid_shape: Tuple[int, int] = (468, 468)  # (ny, nx), static

    @nn.compact
    def __call__(self, voxel_features, coords, train: bool = False):
        ny, nx = self.grid_shape
        return scatter_to_bev(voxel_features, coords, ny, nx)
