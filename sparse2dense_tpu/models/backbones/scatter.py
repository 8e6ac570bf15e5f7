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

from ..norm import BatchNorm
from ..registry import BACKBONES


def scatter_to_bev(features: jnp.ndarray, coords: jnp.ndarray, ny: int, nx: int) -> jnp.ndarray:
    """features (B, V, C), coords (B, V, 3) zyx int -> (B, ny, nx, C)."""
    b, v, c = features.shape
    flat_idx = coords[..., 1] * nx + coords[..., 2]  # (B, V)
    # padded pillars carry coords=-1: route them truly out of bounds (negative
    # indices wrap in JAX even under mode="drop", -1 would hit the last cell)
    flat_idx = jnp.where(jnp.any(coords < 0, axis=-1), ny * nx, flat_idx)

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


@BACKBONES.register_module
class PointPillarsScatter_S2D(nn.Module):
    """Pillar scatter + S2D densification + PCR generator.

    Rebuild of the reference PointPillarsScatter_S2D
    (det3d/models/readers/pillar_encoder.py:220-394) in NHWC. Returns
    (F_S_a, F_S_b, gen_offset, gen_mask); the PCR outputs are NDHWC with a
    singleton depth axis and are None at eval (reference :375-391).

    Deviation (documented): the reference's ConvNeXt LayerNorm binds the 59x59
    grid into the affine shape; we use per-position channel LayerNorm (see
    necks/s2d_rpn.py).
    """

    num_input_features: int = 64
    ds_factor: int = 1
    norm_cfg: Optional[dict] = None
    grid_shape: Tuple[int, int] = (468, 468)
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, voxel_features, coords, train: bool = False):
        from ..necks.s2d_rpn import ConvBNGelu, ConvNeXtBlock, Conv3dBNAct

        ny, nx = self.grid_shape
        an = self.axis_name
        canvas = scatter_to_bev(voxel_features, coords, ny, nx)

        # encoder_1: maxpool /2 -> 1x1 ch32 -> k2 s2 conv -> 1x1 ch128
        y = nn.max_pool(canvas, (2, 2), strides=(2, 2))
        y = ConvBNGelu(32, kernel=1, padding=0, axis_name=an, name="encoder_1a")(y, train)
        y = ConvBNGelu(32, kernel=2, stride=2, padding=0, axis_name=an, name="encoder_1b")(y, train)
        y1 = ConvBNGelu(128, kernel=1, padding=0, axis_name=an, name="encoder_1c")(y, train)

        y = ConvBNGelu(128, stride=2, axis_name=an, name="encoder_2a")(y1, train)
        y2 = ConvBNGelu(256, axis_name=an, name="encoder_2b")(y, train)

        att = ConvNeXtBlock(256, name="convnext_1")(y2) + y2
        att = ConvNeXtBlock(256, name="convnext_2")(att) + att
        att = ConvNeXtBlock(256, name="convnext_3")(att) + att

        # decoder_1: conv then resize back to y1's grid (reference uses
        # nn.Upsample((117,117)))
        d1 = ConvBNGelu(128, axis_name=an, name="decoder_1")(att, train)
        d1 = jax.image.resize(
            d1, (d1.shape[0], y1.shape[1], y1.shape[2], d1.shape[3]), method="nearest"
        )
        y3 = jnp.concatenate([d1, y1], axis=-1)

        d2 = ConvBNGelu(64, axis_name=an, name="decoder_2a")(y3, train)
        d2 = nn.ConvTranspose(
            64, (4, 4), strides=(2, 2), padding="SAME", name="decoder_2b_conv"
        )(d2)
        d2 = BatchNorm(axis_name=an, name="decoder_2b_norm")(
            d2, use_running_average=not train
        )
        d2 = nn.gelu(d2)
        d2 = ConvBNGelu(64, kernel=1, padding=0, axis_name=an, name="decoder_2c")(d2, train)
        f_s_b = jax.image.resize(
            d2, (d2.shape[0], ny, nx, d2.shape[3]), method="nearest"
        )

        f_s_a = (
            ConvBNGelu(64, kernel=1, padding=0, axis_name=an, name="fusion_dense")(f_s_b, train)
            + ConvBNGelu(64, kernel=1, padding=0, axis_name=an, name="fusion_sparse")(canvas, train)
        )

        if train:
            gen = f_s_b[:, None]  # (B, 1, H, W, C): torch view(N,C,1,H,W)
            gen = Conv3dBNAct(32, act="gelu", axis_name=an, name="generator_a")(gen, train)
            gen = Conv3dBNAct(16, act="gelu", axis_name=an, name="generator_b")(gen, train)
            gen_offset = nn.Conv(3, (1, 1, 1), name="gen_out")(gen)
            m = Conv3dBNAct(8, act="gelu", axis_name=an, name="gen_mask_a")(gen, train)
            gen_mask = nn.Conv(1, (1, 1, 1), name="gen_mask_b")(m)
        else:
            gen_offset = gen_mask = None

        return f_s_a, f_s_b, gen_offset, gen_mask
