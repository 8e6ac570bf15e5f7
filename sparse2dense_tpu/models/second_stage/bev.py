"""BEV feature extraction for the second stage.

Rebuild of the reference BEVFeatureExtractor
(det3d/models/second_stage/bird_eye_view.py:10-41) + get_box_center
(detectors/two_stage.py:49-76) with static shapes: boxes come in as a fixed
(B, R, >=7) array (the first stage emits fixed-size, validity-masked
detections), centers are 1 or 5 points per box, and the bilinear gather is a
vmap over the batch.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..registry import SECOND_STAGE


def bilinear_interpolate(im, x, y):
    """im (H, W, C), x/y (N,) -> (N, C). Matches the reference's
    bilinear_interpolate_torch (core/utils/center_utils.py:93) incl. clamping."""
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, im.shape[1] - 1)
    x1 = jnp.clip(x0 + 1, 0, im.shape[1] - 1)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, im.shape[0] - 1)
    y1 = jnp.clip(y0 + 1, 0, im.shape[0] - 1)

    ia = im[y0, x0]
    ib = im[y1, x0]
    ic = im[y0, x1]
    id_ = im[y1, x1]
    x0f, x1f = x0.astype(x.dtype), x1.astype(x.dtype)
    y0f, y1f = y0.astype(y.dtype), y1.astype(y.dtype)
    wa = (x1f - x) * (y1f - y)
    wb = (x1f - x) * (y - y0f)
    wc = (x - x0f) * (y1f - y)
    wd = (x - x0f) * (y - y0f)
    return (
        ia * wa[:, None] + ib * wb[:, None] + ic * wc[:, None] + id_ * wd[:, None]
    )


def box_centers(boxes: jnp.ndarray, num_point: int) -> jnp.ndarray:
    """(B, R, >=7) boxes -> (B, R*num_point, 3) sample points
    (reference two_stage.py:49-76; 5-point = center + 4 edge midpoints)."""
    if num_point == 1:
        return boxes[..., :3]
    assert num_point == 5, num_point
    cx, cy, z = boxes[..., 0], boxes[..., 1], boxes[..., 2]
    dx, dy = boxes[..., 3], boxes[..., 4]
    ang = boxes[..., -1]
    c, s = jnp.cos(ang), jnp.sin(ang)
    # local edge midpoints: (+dx/2, 0), (-dx/2, 0), (0, +dy/2), (0, -dy/2)
    pts = [jnp.stack([cx, cy, z], axis=-1)]
    for lx, ly in ((0.5, 0.0), (-0.5, 0.0), (0.0, 0.5), (0.0, -0.5)):
        px = cx + lx * dx * c - ly * dy * s
        py = cy + lx * dx * s + ly * dy * c
        pts.append(jnp.stack([px, py, z], axis=-1))
    return jnp.concatenate(pts, axis=1)  # (B, R*5, 3)


@SECOND_STAGE.register_module
class BEVFeatureExtractor(nn.Module):
    pc_start: Sequence[float] = (-75.2, -75.2)
    voxel_size: Sequence[float] = (0.1, 0.1)
    out_stride: int = 8

    def __call__(self, bev_feature, centers, num_point: int):
        """bev_feature (B, H, W, C); centers (B, R*num_point, 3) ->
        (B, R, C*num_point)."""
        xs = (centers[..., 0] - self.pc_start[0]) / self.voxel_size[0] / self.out_stride
        ys = (centers[..., 1] - self.pc_start[1]) / self.voxel_size[1] / self.out_stride
        feats = jax.vmap(bilinear_interpolate)(bev_feature, xs, ys)  # (B, R*P, C)
        b, rp, c = feats.shape
        r = rp // num_point
        # concat the per-point sections feature-wise (reference bird_eye_view.py:35-37)
        return jnp.concatenate(
            [feats[:, i * r:(i + 1) * r] for i in range(num_point)], axis=-1
        )
