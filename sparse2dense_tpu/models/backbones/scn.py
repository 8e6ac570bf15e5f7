"""Sparse 3D backbones (SpMiddleResNetFHD, SpMiddleFHD), TPU-native.

Rebuild of the reference spconv backbones (det3d/models/backbones/scn.py:89-288)
on the gather-GEMM-scatter engine in ops/sparse_conv.py. Design notes:

- All shapes are static: every stage has a fixed voxel-row budget (default:
  the input budget V), with a validity mask; padded rows carry coords = -1
  and zeroed features.
- Submanifold stages sharing an spconv ``indice_key`` share one neighbor
  table here, built once per stage from a dense cell->row index grid.
- Strided stages compute their output active set on device (grid-linear
  enumeration order — same *set* as spconv, different row order; numerics
  are order-independent and the dense BEV output is identical).
- ``.dense()`` equivalent: scatter rows into the (D, H, W, C) grid, then
  reshape to NHWC BEV with channel index c*D + d to match the torch
  ``view(N, C*D, H, W)`` layout (reference scn.py:173-176) for checkpoint
  conversion parity.
- batch dim is explicit (B, V, ...) so BatchNorm sees cross-batch statistics
  exactly like the reference's BN1d over concatenated voxels.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ...ops.sparse_conv import (
    build_index_grid_batched,
    conv_out_grid,
    downsample_active_set_batched,
    downsample_neighbor_table_batched,
    gather_conv_batched,
    scatter_to_dense,
    subm_neighbor_table_batched,
)
from ..norm import BatchNorm
from ..registry import BACKBONES


class SparseTensor(NamedTuple):
    """Batched static-shape sparse voxel tensor (the SparseConvTensor analogue)."""

    features: jnp.ndarray  # (B, V, C)
    coords: jnp.ndarray    # (B, V, 3) zyx int32, -1 padding
    valid: jnp.ndarray     # (B, V) bool

    def masked(self) -> "SparseTensor":
        f = self.features * self.valid[..., None].astype(self.features.dtype)
        return SparseTensor(f, self.coords, self.valid)


def sparse_to_bev(x: SparseTensor, grid: Sequence[int]) -> jnp.ndarray:
    """SparseConvTensor.dense() + view(N, C*D, H, W), as NHWC (B, H, W, C*D)."""
    import jax

    dense = jax.vmap(lambda f, c, v: scatter_to_dense(f, c, v, grid))(
        x.features, x.coords, x.valid
    )  # (B, D, H, W, C)
    b, d, h, w, c = dense.shape
    return jnp.transpose(dense, (0, 2, 3, 4, 1)).reshape(b, h, w, c * d)


class SubMStage(nn.Module):
    """n_convs x [SubMConv3d(3x3x3) BN ReLU] over one shared neighbor table."""

    channels: Sequence[int]
    use_bias: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: SparseTensor, nbr, train: bool) -> SparseTensor:
        f = x.features
        for i, ch in enumerate(self.channels):
            w = self.param(
                f"conv_{i}_kernel",
                nn.initializers.variance_scaling(1.0, "fan_in", "uniform"),
                (nbr.shape[-1], f.shape[-1], ch),
            )
            b = (
                self.param(f"conv_{i}_bias", nn.initializers.zeros, (ch,))
                if self.use_bias
                else None
            )
            f = gather_conv_batched(f, nbr, w, b)
            f = BatchNorm(axis_name=self.axis_name, name=f"norm_{i}")(
                f, mask=x.valid[..., None], use_running_average=not train
            )
            f = nn.relu(f)
        return SparseTensor(f, x.coords, x.valid).masked()


class SparseBasicBlock(nn.Module):
    """Residual block of two submanifold convs (reference scn.py:42-85).

    The reference passes bias=True to both convs (scn.py:59-64)."""

    planes: int
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: SparseTensor, nbr, train: bool) -> SparseTensor:
        k = nbr.shape[-1]
        init = nn.initializers.variance_scaling(1.0, "fan_in", "uniform")
        w1 = self.param("conv1_kernel", init, (k, x.features.shape[-1], self.planes))
        b1 = self.param("conv1_bias", nn.initializers.zeros, (self.planes,))
        w2 = self.param("conv2_kernel", init, (k, self.planes, self.planes))
        b2 = self.param("conv2_bias", nn.initializers.zeros, (self.planes,))

        out = gather_conv_batched(x.features, nbr, w1, b1)
        out = BatchNorm(axis_name=self.axis_name, name="bn1")(
            out, mask=x.valid[..., None], use_running_average=not train
        )
        out = nn.relu(out)
        out = gather_conv_batched(out, nbr, w2, b2)
        out = BatchNorm(axis_name=self.axis_name, name="bn2")(
            out, mask=x.valid[..., None], use_running_average=not train
        )
        out = nn.relu(out + x.features)
        return SparseTensor(out, x.coords, x.valid).masked()


class SparseDownsample(nn.Module):
    """SparseConv3d(stride>1) + BN + ReLU; computes the new active set."""

    out_channels: int
    grid_in: Tuple[int, int, int]
    stride: Tuple[int, int, int]
    padding: Tuple[int, int, int]
    ksize: Tuple[int, int, int] = (3, 3, 3)
    out_budget: Optional[int] = None
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: SparseTensor, in_index_grid, train: bool):
        grid_out = conv_out_grid(self.grid_in, self.stride, self.padding, self.ksize)
        budget = self.out_budget or x.features.shape[1]
        oc, ov = downsample_active_set_batched(
            x.coords, x.valid, self.grid_in, grid_out,
            self.stride, self.padding, self.ksize, budget,
        )
        nbr = downsample_neighbor_table_batched(
            oc, ov, in_index_grid, self.grid_in, self.stride, self.padding, self.ksize
        )
        k = nbr.shape[-1]
        w = self.param(
            "conv_kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "uniform"),
            (k, x.features.shape[-1], self.out_channels),
        )
        f = gather_conv_batched(x.features, nbr, w)
        f = BatchNorm(axis_name=self.axis_name, name="norm")(
            f, mask=ov[..., None], use_running_average=not train
        )
        f = nn.relu(f)
        return SparseTensor(f, oc, ov).masked(), grid_out


@BACKBONES.register_module
class SpMiddleResNetFHD(nn.Module):
    """CenterPoint residual sparse backbone (reference scn.py:89-185).

    __call__(voxel_features (B,V,C), coords (B,V,3) zyx, train)
      -> (bev (B, H/8, W/8, 128*2), {"conv1".."conv4": (SparseTensor, grid)}).
    """

    num_input_features: int = 128
    sparse_shape: Tuple[int, int, int] = (41, 1504, 1504)  # (D, H, W)
    stage_budgets: Optional[Tuple[int, int, int, int]] = None
    norm_cfg: Optional[dict] = None
    name_tag: str = "SpMiddleResNetFHD"
    is_student: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, voxel_features, coords, train: bool = False):
        valid = jnp.all(coords >= 0, axis=-1)
        x = SparseTensor(voxel_features, coords.astype(jnp.int32), valid).masked()
        v = voxel_features.shape[1]
        budgets = self.stage_budgets or (v, v, v, v)

        g0 = self.sparse_shape
        idx0 = build_index_grid_batched(x.coords, x.valid, g0)
        nbr0 = subm_neighbor_table_batched(x.coords, x.valid, idx0, g0)
        x = SubMStage((16,), axis_name=self.axis_name, name="conv_input")(x, nbr0, train)
        x = SparseBasicBlock(16, axis_name=self.axis_name, name="conv1_0")(x, nbr0, train)
        x_conv1 = SparseBasicBlock(16, axis_name=self.axis_name, name="conv1_1")(x, nbr0, train)

        x, g1 = SparseDownsample(
            32, g0, (2, 2, 2), (1, 1, 1), out_budget=budgets[0],
            axis_name=self.axis_name, name="conv2_down",
        )(x_conv1, idx0, train)
        idx1 = build_index_grid_batched(x.coords, x.valid, g1)
        nbr1 = subm_neighbor_table_batched(x.coords, x.valid, idx1, g1)
        x = SparseBasicBlock(32, axis_name=self.axis_name, name="conv2_0")(x, nbr1, train)
        x_conv2 = SparseBasicBlock(32, axis_name=self.axis_name, name="conv2_1")(x, nbr1, train)

        x, g2 = SparseDownsample(
            64, g1, (2, 2, 2), (1, 1, 1), out_budget=budgets[1],
            axis_name=self.axis_name, name="conv3_down",
        )(x_conv2, idx1, train)
        idx2 = build_index_grid_batched(x.coords, x.valid, g2)
        nbr2 = subm_neighbor_table_batched(x.coords, x.valid, idx2, g2)
        x = SparseBasicBlock(64, axis_name=self.axis_name, name="conv3_0")(x, nbr2, train)
        x_conv3 = SparseBasicBlock(64, axis_name=self.axis_name, name="conv3_1")(x, nbr2, train)

        x, g3 = SparseDownsample(
            128, g2, (2, 2, 2), (0, 1, 1), out_budget=budgets[2],
            axis_name=self.axis_name, name="conv4_down",
        )(x_conv3, idx2, train)
        idx3 = build_index_grid_batched(x.coords, x.valid, g3)
        nbr3 = subm_neighbor_table_batched(x.coords, x.valid, idx3, g3)
        x = SparseBasicBlock(128, axis_name=self.axis_name, name="conv4_0")(x, nbr3, train)
        x_conv4 = SparseBasicBlock(128, axis_name=self.axis_name, name="conv4_1")(x, nbr3, train)

        x, g4 = SparseDownsample(
            128, g3, (2, 1, 1), (0, 0, 0), ksize=(3, 1, 1), out_budget=budgets[3],
            axis_name=self.axis_name, name="extra_conv",
        )(x_conv4, idx3, train)

        bev = sparse_to_bev(x, g4)
        multi_scale = {
            "conv1": (x_conv1, g0),
            "conv2": (x_conv2, g1),
            "conv3": (x_conv3, g2),
            "conv4": (x_conv4, g3),
        }
        return bev, multi_scale


@BACKBONES.register_module
class SpMiddleFHD(nn.Module):
    """SECOND non-residual sparse backbone (reference scn.py:188-288).

    Returns (bev (B, H/8, W/8, 64*2), (conv4 SparseTensor, conv4 grid)).
    """

    num_input_features: int = 128
    sparse_shape: Tuple[int, int, int] = (41, 1504, 1504)
    stage_budgets: Optional[Tuple[int, int, int, int]] = None
    norm_cfg: Optional[dict] = None
    name_tag: str = "SpMiddleFHD"
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, voxel_features, coords, train: bool = False):
        valid = jnp.all(coords >= 0, axis=-1)
        x = SparseTensor(voxel_features, coords.astype(jnp.int32), valid).masked()
        v = voxel_features.shape[1]
        budgets = self.stage_budgets or (v, v, v, v)

        g0 = self.sparse_shape
        idx0 = build_index_grid_batched(x.coords, x.valid, g0)
        nbr0 = subm_neighbor_table_batched(x.coords, x.valid, idx0, g0)
        x = SubMStage((16, 16), axis_name=self.axis_name, name="subm0")(x, nbr0, train)

        x, g1 = SparseDownsample(
            32, g0, (2, 2, 2), (1, 1, 1), out_budget=budgets[0],
            axis_name=self.axis_name, name="down1",
        )(x, idx0, train)
        idx1 = build_index_grid_batched(x.coords, x.valid, g1)
        nbr1 = subm_neighbor_table_batched(x.coords, x.valid, idx1, g1)
        x = SubMStage((32, 32), axis_name=self.axis_name, name="subm1")(x, nbr1, train)

        x, g2 = SparseDownsample(
            64, g1, (2, 2, 2), (1, 1, 1), out_budget=budgets[1],
            axis_name=self.axis_name, name="down2",
        )(x, idx1, train)
        idx2 = build_index_grid_batched(x.coords, x.valid, g2)
        nbr2 = subm_neighbor_table_batched(x.coords, x.valid, idx2, g2)
        x = SubMStage((64, 64, 64), axis_name=self.axis_name, name="subm2")(x, nbr2, train)

        x, g3 = SparseDownsample(
            64, g2, (2, 2, 2), (0, 1, 1), out_budget=budgets[2],
            axis_name=self.axis_name, name="down3",
        )(x, idx2, train)
        idx3 = build_index_grid_batched(x.coords, x.valid, g3)
        nbr3 = subm_neighbor_table_batched(x.coords, x.valid, idx3, g3)
        conv4 = SubMStage((64, 64, 64), axis_name=self.axis_name, name="subm3")(x, nbr3, train)

        x, g4 = SparseDownsample(
            64, g3, (2, 1, 1), (0, 0, 0), ksize=(3, 1, 1), out_budget=budgets[3],
            axis_name=self.axis_name, name="extra_conv",
        )(conv4, idx3, train)

        bev = sparse_to_bev(x, g4)
        return bev, (conv4, g3)
