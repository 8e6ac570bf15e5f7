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

from typing import Any, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _pet(x):
    """preferred_element_type for MXU ops: f32 outputs for f32 inputs; for
    bf16 inputs leave the output bf16 (the MXU accumulates f32 internally
    either way, and callers cast right after) — requesting f32 outputs from
    bf16 operands breaks the AD transpose (dtype-mismatched cotangents)."""
    import jax.numpy as _jnp
    return _jnp.float32 if x.dtype == _jnp.float32 else None
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
    dense = jax.vmap(lambda f, c, v: scatter_to_dense(f, c, v, grid))(
        x.features, x.coords, x.valid
    )  # (B, D, H, W, C)
    b, d, h, w, c = dense.shape
    return jnp.transpose(dense, (0, 2, 3, 4, 1)).reshape(b, h, w, c * d)


def _conv3d_zdecomp(x, wk, stride, pad, compute_dtype=None):
    """3D conv as kz stacked 2D convs with z folded into the batch dim.

    XLA's native NDHWC 3D conv lowers pathologically on TPU (~8x off the
    MXU roofline at the shapes here — measured +333 ms for one dense conv2
    stage); the z-decomposition hits the well-tuned NHWC 2D conv path.
    x (B, D, H, W, C); wk (kz, ky, kx, Cin, Cout); pad = ((pz, pz2), ...).
    Accumulation stays f32; compute_dtype (e.g. bf16) casts conv inputs.
    """
    bsz, d, hh, ww, cin = x.shape
    kz = wk.shape[0]
    sz, sy, sx = stride
    (pz, pz2), pyx = pad[0], [pad[1], pad[2]]
    d_out = (d + pz + pz2 - kz) // sz + 1
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        wk = wk.astype(compute_dtype)
    xp = jnp.pad(x, ((0, 0), (pz, pz2), (0, 0), (0, 0), (0, 0)))
    # the kz partial sums accumulate in the compute dtype (each 2D conv
    # already accumulates f32 internally); keeping them f32 doubles the
    # GB-scale activation buffers of the big dense stages
    acc_dtype = x.dtype if compute_dtype is None else compute_dtype
    y = None
    for iz in range(kz):
        planes = jax.lax.slice_in_dim(xp, iz, iz + (d_out - 1) * sz + 1, sz,
                                      axis=1)
        yz = jax.lax.conv_general_dilated(
            planes.reshape((bsz * d_out,) + planes.shape[2:]),
            wk[iz], (sy, sx), pyx,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=_pet(planes),
        ).astype(acc_dtype)
        y = yz if y is None else y + yz
    return y.reshape((bsz, d_out) + y.shape[1:])


def _conv3d_zpack(x, wk, compute_dtype=None):
    """Stride-1 SAME 3x3x3 conv as ONE 2D conv with Cout' = 3*Cout plus
    static z-shifted block adds: y[z] = u[z-1]@W[0] + u[z]@W[1] + u[z+1]@W[2].

    Same FLOPs as the z-decomposition but 3x the MXU output lanes — measured
    17.9 -> 57 TF/s on the conv2-scale dense stage (C=32, 752^2 planes, bf16,
    v5e). x (B, D, H, W, C); wk (3, 3, 3, Cin, Cout)."""
    bsz, d, hh, ww, cin = x.shape
    co = wk.shape[-1]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        wk = wk.astype(compute_dtype)
    acc_dtype = x.dtype
    wcat = jnp.concatenate([wk[0], wk[1], wk[2]], axis=-1)  # (3,3,Cin,3Co)
    u = jax.lax.conv_general_dilated(
        x.reshape((bsz * d,) + x.shape[2:]), wcat, (1, 1),
        [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=_pet(x),
    ).astype(acc_dtype)
    u = u.reshape(bsz, d, hh, ww, 3 * co)
    y = u[:, :, :, :, co:2 * co]
    zpad = ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0))
    y = y + jnp.pad(u[:, :d - 1, :, :, 0:co], zpad)
    zpad = ((0, 0), (0, 1), (0, 0), (0, 0), (0, 0))
    y = y + jnp.pad(u[:, 1:, :, :, 2 * co:], zpad)
    return y


def dense_subm_conv(x, mask, w, b=None, compute_dtype=None):
    """Submanifold conv on a DENSE (B, D, H, W, C) grid: a plain 3D conv whose
    output is masked back to the active set. Exactly equals the gather-GEMM
    path (inactive inputs are zero; outputs exist only at active sites).
    w: (K, Cin, Cout) with z-major tap order -> (kz, ky, kx, Cin, Cout).
    ``compute_dtype`` (e.g. bf16) casts conv inputs; accumulation stays f32
    inside each 2D conv. 3x3x3 kernels use the z-packed formulation."""
    k = w.shape[0]
    if k == 27:
        kshape = (3, 3, 3)
    elif k == 3:
        kshape = (3, 1, 1)
    else:
        kshape = (1, 1, k)
    wk = w.reshape(kshape + w.shape[1:])
    if k == 27:
        y = _conv3d_zpack(x, wk, compute_dtype=compute_dtype).astype(x.dtype)
    else:
        pad = [(s // 2, s // 2) for s in kshape]
        y = _conv3d_zdecomp(x, wk, (1, 1, 1), pad,
                            compute_dtype=compute_dtype).astype(x.dtype)
    if b is not None:
        y = y + b
    return y * mask


def dense_strided_conv(x, mask, w, stride, padding, kshape,
                       compute_dtype=None):
    """Strided sparse conv on a dense grid: dense conv + the dilated
    occupancy mask (the active output set IS the kernel-footprint dilation
    of the input occupancy — same set as downsample_active_set)."""
    wk = w.reshape(tuple(kshape) + w.shape[1:])
    pad = [(p, p) for p in padding]
    y = _conv3d_zdecomp(x, wk, tuple(stride), pad,
                        compute_dtype=compute_dtype).astype(x.dtype)
    new_mask = jax.lax.reduce_window(
        mask, -jnp.inf, jax.lax.max,
        (1,) + tuple(kshape) + (1,), (1,) + tuple(stride) + (1,),
        [(0, 0)] + list(pad) + [(0, 0)],
    )
    new_mask = (new_mask > 0).astype(x.dtype)
    return y * new_mask, new_mask


class DenseSubMStage(nn.Module):
    """n x [masked dense conv + BN + ReLU] (dense-mode SubMStage)."""

    channels: Sequence[int]
    use_bias: bool = False
    axis_name: Optional[str] = None
    compute_dtype: Optional[str] = None  # e.g. "bfloat16"; f32 accumulate

    @nn.compact
    def __call__(self, x, mask, train: bool):
        cd = jnp.dtype(self.compute_dtype) if self.compute_dtype else None
        for i, ch in enumerate(self.channels):
            w = self.param(
                f"conv_{i}_kernel",
                nn.initializers.variance_scaling(1.0, "fan_in", "uniform"),
                (27, x.shape[-1], ch),
            )
            b = (self.param(f"conv_{i}_bias", nn.initializers.zeros, (ch,))
                 if self.use_bias else None)
            x = dense_subm_conv(x, mask, w, b, compute_dtype=cd)
            x = BatchNorm(axis_name=self.axis_name, name=f"norm_{i}")(
                x, mask=mask, use_running_average=not train
            )
            x = nn.relu(x) * mask
        return x


class DenseBasicBlock(nn.Module):
    """Residual block of two masked dense convs (dense-mode SparseBasicBlock;
    parameter names match the sparse variant so checkpoints interchange)."""

    planes: int
    axis_name: Optional[str] = None
    compute_dtype: Optional[str] = None

    @nn.compact
    def __call__(self, x, mask, train: bool):
        cd = jnp.dtype(self.compute_dtype) if self.compute_dtype else None
        init = nn.initializers.variance_scaling(1.0, "fan_in", "uniform")
        w1 = self.param("conv1_kernel", init, (27, x.shape[-1], self.planes))
        b1 = self.param("conv1_bias", nn.initializers.zeros, (self.planes,))
        w2 = self.param("conv2_kernel", init, (27, self.planes, self.planes))
        b2 = self.param("conv2_bias", nn.initializers.zeros, (self.planes,))
        out = dense_subm_conv(x, mask, w1, b1, compute_dtype=cd)
        out = BatchNorm(axis_name=self.axis_name, name="bn1")(
            out, mask=mask, use_running_average=not train)
        out = nn.relu(out) * mask
        out = dense_subm_conv(out, mask, w2, b2, compute_dtype=cd)
        out = BatchNorm(axis_name=self.axis_name, name="bn2")(
            out, mask=mask, use_running_average=not train)
        return nn.relu(out + x) * mask


class DenseDownsample(nn.Module):
    """Strided conv + BN + ReLU on the dense grid (dense-mode
    SparseDownsample; parameter names match)."""

    out_channels: int
    stride: Tuple[int, int, int]
    padding: Tuple[int, int, int]
    ksize: Tuple[int, int, int] = (3, 3, 3)
    axis_name: Optional[str] = None
    compute_dtype: Optional[str] = None

    @nn.compact
    def __call__(self, x, mask, train: bool):
        cd = jnp.dtype(self.compute_dtype) if self.compute_dtype else None
        w = self.param(
            "conv_kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "uniform"),
            (int(np.prod(self.ksize)), x.shape[-1], self.out_channels),
        )
        y, new_mask = dense_strided_conv(
            x, mask, w, self.stride, self.padding, self.ksize,
            compute_dtype=cd)
        y = BatchNorm(axis_name=self.axis_name, name="norm")(
            y, mask=new_mask, use_running_average=not train)
        return nn.relu(y) * new_mask, new_mask


def _dense_mods(train: bool, remat: bool):
    """The dense-stage module classes, rematerialized under training.

    The masked-dense stages hold multi-GB activations on the Waymo grids
    (conv2: 1.1-2.3 GB per conv at bf16); saving them all for backward
    overflows HBM in the TS distillation step (measured 22.6 GB needed).
    jax.checkpoint recomputes them in the backward instead (VERDICT r2 #8).
    Parameter names are unchanged by nn.remat."""
    if train and remat:
        return (nn.remat(DenseSubMStage, static_argnums=(3,)),
                nn.remat(DenseBasicBlock, static_argnums=(3,)),
                nn.remat(DenseDownsample, static_argnums=(3,)))
    return DenseSubMStage, DenseBasicBlock, DenseDownsample


class ColSubMStage(nn.Module):
    """n x [column submanifold conv + BN + ReLU] (column engine)."""

    channels: Sequence[int]
    use_bias: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, cf, zmask, nbr, train: bool):
        from ...ops.column_conv import col_subm_conv

        for i, ch in enumerate(self.channels):
            w = self.param(
                f"conv_{i}_kernel",
                nn.initializers.variance_scaling(1.0, "fan_in", "uniform"),
                (27, cf.shape[-1], ch),
            )
            b = (self.param(f"conv_{i}_bias", nn.initializers.zeros, (ch,))
                 if self.use_bias else None)
            cf = col_subm_conv(cf, zmask, nbr, w, b)
            cf = BatchNorm(axis_name=self.axis_name, name=f"norm_{i}")(
                cf, mask=zmask, use_running_average=not train
            )
            cf = nn.relu(cf) * zmask
        return cf


class ColBasicBlock(nn.Module):
    """Residual block in column layout (parameter names match
    SparseBasicBlock so checkpoints interchange across engines)."""

    planes: int
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, cf, zmask, nbr, train: bool):
        from ...ops.column_conv import col_subm_conv

        init = nn.initializers.variance_scaling(1.0, "fan_in", "uniform")
        w1 = self.param("conv1_kernel", init, (27, cf.shape[-1], self.planes))
        b1 = self.param("conv1_bias", nn.initializers.zeros, (self.planes,))
        w2 = self.param("conv2_kernel", init, (27, self.planes, self.planes))
        b2 = self.param("conv2_bias", nn.initializers.zeros, (self.planes,))
        out = col_subm_conv(cf, zmask, nbr, w1, b1)
        out = BatchNorm(axis_name=self.axis_name, name="bn1")(
            out, mask=zmask, use_running_average=not train)
        out = nn.relu(out) * zmask
        out = col_subm_conv(out, zmask, nbr, w2, b2)
        out = BatchNorm(axis_name=self.axis_name, name="bn2")(
            out, mask=zmask, use_running_average=not train)
        return nn.relu(out + cf) * zmask


class ColDownsample(nn.Module):
    """Strided sparse conv in column layout: new column set (2D dilation),
    z handled densely inside the slabs."""

    out_channels: int
    hw_in: Tuple[int, int]
    z_pad: int
    d_out: int
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, cf, zmask, cols, cvalid, col_budget, train: bool):
        from ...ops.column_conv import (
            build_col_table,
            col_z_strided_conv,
            downsample_columns,
            strided_col_neighbor_table,
            z_mask_downsample,
        )

        hw_out = tuple((g + 2 * 1 - 3) // 2 + 1 for g in self.hw_in)
        ocols, ovalid = downsample_columns(cols, cvalid, self.hw_in, hw_out,
                                           col_budget)
        tbl = build_col_table(cols, cvalid, self.hw_in)
        snbr = strided_col_neighbor_table(ocols, ovalid, tbl, self.hw_in)
        w = self.param(
            "conv_kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "uniform"),
            (27, cf.shape[-1], self.out_channels),
        )
        out = col_z_strided_conv(cf, zmask, snbr, w, self.z_pad, self.d_out)
        new_zm = z_mask_downsample(zmask, snbr, self.z_pad, self.d_out)
        out = out * new_zm
        out = BatchNorm(axis_name=self.axis_name, name="norm")(
            out, mask=new_zm, use_running_average=not train)
        out = nn.relu(out) * new_zm
        return out, new_zm, ocols, ovalid, hw_out


class WinSubMStage(nn.Module):
    """n x [windowed one-hot subm conv + BN + ReLU] (window engine; parameter
    names/shapes match SubMStage so checkpoints interchange)."""

    channels: Sequence[int]
    use_bias: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, feats, valid, plan, train: bool):
        from ...ops import window_conv as WC

        for i, ch in enumerate(self.channels):
            w = self.param(
                f"conv_{i}_kernel",
                nn.initializers.variance_scaling(1.0, "fan_in", "uniform"),
                (27, feats.shape[-1], ch),
            )
            b = (self.param(f"conv_{i}_bias", nn.initializers.zeros, (ch,))
                 if self.use_bias else None)
            wd = WC.taps_zyx_to_dyx(w)
            feats = jax.vmap(
                lambda f, p: WC.window_conv(f, p, wd, b)
            )(feats, plan)
            feats = BatchNorm(axis_name=self.axis_name, name=f"norm_{i}")(
                feats, mask=valid[..., None], use_running_average=not train)
            feats = nn.relu(feats) * valid[..., None].astype(feats.dtype)
        return feats


class WinBasicBlock(nn.Module):
    """Residual block, window engine (names match SparseBasicBlock)."""

    planes: int
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, feats, valid, plan, train: bool):
        from ...ops import window_conv as WC

        init = nn.initializers.variance_scaling(1.0, "fan_in", "uniform")
        w1 = self.param("conv1_kernel", init, (27, feats.shape[-1], self.planes))
        b1 = self.param("conv1_bias", nn.initializers.zeros, (self.planes,))
        w2 = self.param("conv2_kernel", init, (27, self.planes, self.planes))
        b2 = self.param("conv2_bias", nn.initializers.zeros, (self.planes,))
        wd1, wd2 = WC.taps_zyx_to_dyx(w1), WC.taps_zyx_to_dyx(w2)
        m = valid[..., None].astype(feats.dtype)
        out = jax.vmap(lambda f, p: WC.window_conv(f, p, wd1, b1))(
            feats, plan)
        out = BatchNorm(axis_name=self.axis_name, name="bn1")(
            out, mask=valid[..., None], use_running_average=not train)
        out = nn.relu(out) * m
        out = jax.vmap(lambda f, p: WC.window_conv(f, p, wd2, b2))(
            out, plan)
        out = BatchNorm(axis_name=self.axis_name, name="bn2")(
            out, mask=valid[..., None], use_running_average=not train)
        return nn.relu(out + feats) * m


class WinDownsample(nn.Module):
    """Strided sparse conv, window engine (names match SparseDownsample)."""

    out_channels: int
    grid_in: Tuple[int, int, int]
    stride: Tuple[int, int, int]
    padding: Tuple[int, int, int]
    ksize: Tuple[int, int, int] = (3, 3, 3)
    out_budget: Optional[int] = None
    block: int = 128
    window: int = 512
    resid_budget: int = 1024
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, feats, coords, lin, train: bool):
        from ...ops import window_conv as WC
        from ...ops.sparse_conv import conv_out_grid

        grid_out = conv_out_grid(self.grid_in, self.stride, self.padding,
                                 self.ksize)
        budget = self.out_budget or feats.shape[1]
        valid_in = jnp.all(coords >= 0, axis=-1)
        oc, ol = jax.vmap(
            lambda c, v: WC.downsample_active_set_yxz(
                c, v, self.grid_in, grid_out, self.stride, self.padding,
                self.ksize, budget)
        )(coords, valid_in)
        plan = jax.vmap(
            lambda il, o_l, o_c: WC.make_strided_plan(
                il, o_l, o_c, self.grid_in, grid_out, self.stride,
                self.padding, self.ksize, block=self.block,
                window=self.window, resid_budget=self.resid_budget)
        )(lin, ol, oc)
        self.sow("telemetry", "win_resid", jnp.sum(plan.n_resid))
        k = int(np.prod(self.ksize))
        w = self.param(
            "conv_kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "uniform"),
            (k, feats.shape[-1], self.out_channels),
        )
        wd = WC.taps_zyx_to_dyx(w, self.ksize)
        out = jax.vmap(lambda f, p: WC.window_conv(f, p, wd, ksize=self.ksize))(
            feats, plan)
        ovalid = jnp.all(oc >= 0, axis=-1)
        out = BatchNorm(axis_name=self.axis_name, name="norm")(
            out, mask=ovalid[..., None], use_running_average=not train)
        out = nn.relu(out) * ovalid[..., None].astype(out.dtype)
        return out, oc, ol, ovalid, grid_out


class TileSubMStage(nn.Module):
    """n x [tile subm conv + BN + ReLU] (z-chunked tile engine, planes
    backend ops/tile_planes.py; parameter names/shapes match SubMStage so
    checkpoints interchange). State: p (B, N, ty+2, tx+2, C) halo-complete
    planes, mask (B, N, ty, tx, 1)."""

    channels: Sequence[int]
    tz: int
    use_bias: bool = False
    axis_name: Optional[str] = None
    compute_dtype: Optional[str] = None

    @nn.compact
    def __call__(self, y, mask, ts, train: bool):
        from ...ops import tile_planes as TP

        cd = jnp.dtype(self.compute_dtype) if self.compute_dtype else None
        miss = jnp.int32(0)
        for i, ch in enumerate(self.channels):
            w = self.param(
                f"conv_{i}_kernel",
                nn.initializers.variance_scaling(1.0, "fan_in", "uniform"),
                (27, y.shape[-1], ch),
            )
            b = (self.param(f"conv_{i}_bias", nn.initializers.zeros, (ch,))
                 if self.use_bias else None)
            y, nm = jax.vmap(
                lambda yy, m, t: TP.subm_conv(yy, m, t, self.tz, w, b,
                                              compute_dtype=cd)
            )(y, mask, ts)
            miss = miss + jnp.sum(nm)
            y = BatchNorm(axis_name=self.axis_name, name=f"norm_{i}")(
                y, mask=mask, use_running_average=not train)
            y = nn.relu(y) * mask.astype(y.dtype)
        self.sow("telemetry", "halo_miss", miss)
        return y


class TileBasicBlock(nn.Module):
    """Residual block, tile engine planes backend (names match
    SparseBasicBlock)."""

    planes: int
    tz: int
    axis_name: Optional[str] = None
    compute_dtype: Optional[str] = None

    @nn.compact
    def __call__(self, y, mask, ts, train: bool):
        from ...ops import tile_planes as TP

        cd = jnp.dtype(self.compute_dtype) if self.compute_dtype else None
        init = nn.initializers.variance_scaling(1.0, "fan_in", "uniform")
        w1 = self.param("conv1_kernel", init, (27, y.shape[-1], self.planes))
        b1 = self.param("conv1_bias", nn.initializers.zeros, (self.planes,))
        w2 = self.param("conv2_kernel", init, (27, self.planes, self.planes))
        b2 = self.param("conv2_bias", nn.initializers.zeros, (self.planes,))
        res = y
        out, m1 = jax.vmap(
            lambda yy, m, t: TP.subm_conv(yy, m, t, self.tz, w1, b1,
                                          compute_dtype=cd))(y, mask, ts)
        out = BatchNorm(axis_name=self.axis_name, name="bn1")(
            out, mask=mask, use_running_average=not train)
        out = nn.relu(out) * mask.astype(out.dtype)
        out, m2 = jax.vmap(
            lambda yy, m, t: TP.subm_conv(yy, m, t, self.tz, w2, b2,
                                          compute_dtype=cd))(out, mask, ts)
        out = BatchNorm(axis_name=self.axis_name, name="bn2")(
            out, mask=mask, use_running_average=not train)
        out = nn.relu(out + res) * mask.astype(out.dtype)
        self.sow("telemetry", "halo_miss", jnp.sum(m1) + jnp.sum(m2))
        return out


class TileDownsample(nn.Module):
    """Strided sparse conv, tile engine planes backend (names match
    SparseDownsample)."""

    out_channels: int
    tz: int
    tz_out: int
    budget_out: int
    padding: Tuple[int, int, int]
    ksize: Tuple[int, int, int] = (3, 3, 3)
    axis_name: Optional[str] = None
    compute_dtype: Optional[str] = None

    @nn.compact
    def __call__(self, y, mask, ts, grid, train: bool):
        from ...ops import tile_planes as TP
        from ...ops.sparse_conv import conv_out_grid

        cd = jnp.dtype(self.compute_dtype) if self.compute_dtype else None
        w = self.param(
            "conv_kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "uniform"),
            (int(np.prod(self.ksize)), y.shape[-1], self.out_channels),
        )

        def one(yy, m, t):
            yo, mo, tso, _, miss = TP.downsample(
                yy, m, t, grid, w, self.ksize, self.padding,
                tz=self.tz, tz_out=self.tz_out, budget_out=self.budget_out,
                compute_dtype=cd)
            return yo, mo, tso, miss

        y, mout, ts_out, miss = jax.vmap(one)(y, mask, ts)
        grid_out = conv_out_grid(grid, (2, 2, 2), self.padding, self.ksize)
        y = BatchNorm(axis_name=self.axis_name, name="norm")(
            y, mask=mout, use_running_average=not train)
        y = nn.relu(y) * mout.astype(y.dtype)
        self.sow("telemetry", "halo_miss", jnp.sum(miss))
        self.sow("telemetry", "down_drop", jnp.sum(ts_out.n_drop))
        return y, mout, ts_out, grid_out


class TileZConv(nn.Module):
    """extra_conv in tile space: z-only (3,1,1) stride-(2,1,1) conv + BN +
    ReLU inside each (single-z-chunk) tile (names match SparseDownsample).
    Takes interior plane rows; returns (T1, d2, ty, tx, Cout) per batch."""

    out_channels: int
    d: int
    tz: int
    axis_name: Optional[str] = None
    compute_dtype: Optional[str] = None

    @nn.compact
    def __call__(self, p, mask, train: bool):
        from ...ops import tile_planes as TP

        cd = jnp.dtype(self.compute_dtype) if self.compute_dtype else None
        w = self.param(
            "conv_kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "uniform"),
            (3, p.shape[-1], self.out_channels),
        )  # p: interior plane rows (B, N, ty, tx, C)
        y, m = jax.vmap(
            lambda yy, mk: TP.zconv(yy, mk, w, self.d, self.tz,
                                    compute_dtype=cd)
        )(p, mask)
        y = BatchNorm(axis_name=self.axis_name, name="norm")(
            y, mask=m, use_running_average=not train)
        return nn.relu(y) * m.astype(y.dtype), m


class TileKStage(nn.Module):
    """Parameter twin of TileSubMStage for the fused Pallas tile kernel:
    declares the identical conv/BN tree (checkpoints interchange) and
    returns the raw (w, bias, bn_vars) list for epilogue folding."""

    channels: Sequence[int]
    in_channels: int
    use_bias: bool = False

    @nn.compact
    def __call__(self):
        from ..norm import BNVars

        out, c = [], self.in_channels
        init = nn.initializers.variance_scaling(1.0, "fan_in", "uniform")
        for i, ch in enumerate(self.channels):
            w = self.param(f"conv_{i}_kernel", init, (27, c, ch))
            b = (self.param(f"conv_{i}_bias", nn.initializers.zeros, (ch,))
                 if self.use_bias else None)
            bn = BNVars(name=f"norm_{i}")(ch)
            out.append((w, b, bn))
            c = ch
        return out


class TileKBlock(nn.Module):
    """Parameter twin of TileBasicBlock (names match SparseBasicBlock)."""

    planes: int
    in_channels: int

    @nn.compact
    def __call__(self):
        from ..norm import BNVars

        init = nn.initializers.variance_scaling(1.0, "fan_in", "uniform")
        w1 = self.param("conv1_kernel", init,
                        (27, self.in_channels, self.planes))
        b1 = self.param("conv1_bias", nn.initializers.zeros, (self.planes,))
        bn1 = BNVars(name="bn1")(self.planes)
        w2 = self.param("conv2_kernel", init, (27, self.planes, self.planes))
        b2 = self.param("conv2_bias", nn.initializers.zeros, (self.planes,))
        bn2 = BNVars(name="bn2")(self.planes)
        return (w1, b1, bn1), (w2, b2, bn2)


class PlaneKBlock(nn.Module):
    """Residual block on active-plane state rows (plane engine; parameter
    names match SparseBasicBlock so checkpoints interchange across
    engines). Eval fuses bias+BN+ReLU+residual+mask into the Pallas
    plane-kernel epilogue (ops/pallas/plane_block_kernel.py) and chains
    the kernel-emitted edge exports between convs; train runs the kernel
    conv through a custom_vjp (reference-vjp backward,
    ops/plane_conv.pk_subm_conv_train) with unfolded masked BatchNorm so
    batch statistics and running averages stay exact."""

    planes: int
    in_channels: int
    win: Tuple[int, int] = (128, 128)
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, state, exports, mask, plan, nbr, train: bool):
        from ...ops import plane_conv as PK
        from ..norm import BNVars

        init = nn.initializers.variance_scaling(1.0, "fan_in", "uniform")
        w1 = self.param("conv1_kernel", init,
                        (27, self.in_channels, self.planes))
        b1 = self.param("conv1_bias", nn.initializers.zeros, (self.planes,))
        w2 = self.param("conv2_kernel", init, (27, self.planes, self.planes))
        b2 = self.param("conv2_bias", nn.initializers.zeros, (self.planes,))
        w0, wy = self.win
        mask16 = PK.expand_mask(mask, self.planes).astype(state.dtype)
        if not train:
            bn1 = BNVars(name="bn1")(self.planes)
            bn2 = BNVars(name="bn2")(self.planes)
            sc1, sh1 = PK.fold_epilogue(
                self.planes, bias=b1, bn_scale=bn1[0], bn_bias=bn1[1],
                bn_mean=bn1[2], bn_var=bn1[3], eps=1e-3)
            sc2, sh2 = PK.fold_epilogue(
                self.planes, bias=b2, bn_scale=bn2[0], bn_bias=bn2[1],
                bn_mean=bn2[2], bn_var=bn2[3], eps=1e-3)
            out, exp = PK.pk_subm_conv(
                state, exports, plan, w1, sc1, sh1, mask16, relu=True,
                w0=w0, wy=wy)
            out, exp = PK.pk_subm_conv(
                out, exp, plan, w2, sc2, sh2, mask16, residual=state,
                relu=True, w0=w0, wy=wy)
            return out, exp

        t = state.shape[0]

        def bn(x, name):
            xr = x.reshape(t, 16, self.planes)
            y = BatchNorm(axis_name=self.axis_name, name=name)(
                xr, mask=mask[..., None], use_running_average=False)
            return y.reshape(t, 16 * self.planes).astype(state.dtype)

        out = PK.pk_subm_conv_train(state, plan, nbr, w1, mask16,
                                    w0=w0, wy=wy)
        out = bn(out + jnp.tile(b1, 16).astype(out.dtype), "bn1")
        out = nn.relu(out) * mask16
        out = PK.pk_subm_conv_train(out, plan, nbr, w2, mask16,
                                    w0=w0, wy=wy)
        out = bn(out + jnp.tile(b2, 16).astype(out.dtype), "bn2")
        out = nn.relu(out + state) * mask16
        return out, None


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


def _stage_windows(win_window) -> Tuple[int, int, int, int]:
    """Per-stage rank-window sizes (conv1, conv2, conv3, conv4+extra) from an
    int (same everywhere) or a 4-tuple."""
    if isinstance(win_window, (tuple, list)):
        assert len(win_window) == 4, win_window
        return tuple(int(w) for w in win_window)
    return (int(win_window),) * 4


def densify(x: SparseTensor, grid) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """SparseTensor -> (dense (B, D, H, W, C), occupancy mask (B, D, H, W, 1))."""
    dense = jax.vmap(lambda f, c, v: scatter_to_dense(f, c, v, grid))(
        x.features, x.coords, x.valid
    )
    ones = jnp.ones(x.valid.shape + (1,), x.features.dtype) * \
        x.valid[..., None].astype(x.features.dtype)
    mask = jax.vmap(lambda f, c, v: scatter_to_dense(f, c, v, grid))(
        ones, x.coords, x.valid
    )
    return dense, mask


def dense_to_bev(x: jnp.ndarray) -> jnp.ndarray:
    """(B, D, H, W, C) -> (B, H, W, C*D) with channel index c*D+d (the torch
    view(N, C*D, H, W) layout, reference scn.py:173-176)."""
    b, d, h, w, c = x.shape
    return jnp.transpose(x, (0, 2, 3, 4, 1)).reshape(b, h, w, c * d)


@BACKBONES.register_module
class SpMiddleResNetFHD(nn.Module):
    """CenterPoint residual sparse backbone (reference scn.py:89-185).

    __call__(voxel_features (B,V,C), coords (B,V,3) zyx, train)
      -> (bev (B, H/8, W/8, 128*2), {"conv1".."conv4": (SparseTensor, grid)}).

    ``dense_from_stage`` switches stages >= k (1=conv2, 2=conv3, 3=conv4,
    4=extra) from gather-GEMM to masked dense 3D convs — numerically the same
    operator, but MXU-bound instead of gather-bound. Once the grid shrinks
    (1/4 resolution: 11x376x376) random row gathers cost far more than the
    ~3% useful dense FLOPs, so the default densifies from conv3 on. Parameter
    names are identical in both modes.
    """

    num_input_features: int = 128
    sparse_shape: Tuple[int, int, int] = (41, 1504, 1504)  # (D, H, W)
    # active-row budgets for the DOWNSAMPLE OUTPUTS, i.e. the row counts of
    # (conv2, conv3, conv4, extra); the conv1 stage runs at the input V
    stage_budgets: Optional[Tuple[int, int, int, int]] = None
    dense_from_stage: int = 2
    # "gather" (row GEMM), "column" (z-dense slabs), "window" (one-hot MXU),
    # "tile" (z-chunked BEV-tile block-sparse — the fast trainable engine)
    engine: str = "gather"
    # rank-window size of the 'window' engine: int (all stages) or a
    # per-stage tuple (conv1, conv2, conv3, conv4+extra) — per-BEV-line
    # occupancy differs per stage, so the coverage floor does too
    win_window: Any = 384
    # residual-row budget of the STRIDED window plans (WinDownsample):
    # output rows whose neighbor ranks fall outside the rank window take a
    # gather-based exact fallback capped at this many rows (cost is ~27
    # gathered rows each, ~1-3 ms at 16k). The conv1->conv2 downsample of
    # the plane engine measures 13.8k residual rows at W=384 on the
    # synthetic Waymo scene — the old 1024 default silently dropped their
    # contributions (overflow is counted in the win_resid telemetry)
    win_resid_budget: int = 16384
    # tile engine geometry: BEV tile (ty, tx), per-stage z-chunk heights
    # (conv1..conv4; each downsample needs 2*tz_out == tz or tz_out >= d_out)
    # and per-stage occupied-tile budgets (overflow is counted, see
    # telemetry collection)
    tile_size: Tuple[int, int] = (4, 4)
    tile_tz: Tuple[int, int, int, int] = (8, 4, 2, 6)
    tile_budgets: Tuple[int, int, int, int] = (72000, 36000, 14000, 2400)
    # tile engine backend: "xla" = ops/tile_planes.py everywhere; "pallas" =
    # the fused block kernel (ops/pallas/tile_block_kernel.py) for the subm
    # stages at inference (training and downsamples stay on the XLA path)
    tile_backend: str = "xla"
    # pallas backend rank-window size in TILES: int or per-stage 4-tuple;
    # targets outside the window are dropped and counted (telemetry).
    # NOTE: the 256 default was tuned drop-free on the synthetic Waymo
    # scene (tools/profile_model.synth_voxels); denser scenes can exceed
    # it, in which case neighbor contributions are dropped SILENTLY
    # unless the caller watches the "tilek_miss" telemetry counter
    # (Trainer surfaces it in train metrics; eval scripts should assert
    # it is zero or widen the window).
    tilek_window: Any = 256
    # active-plane Pallas engine ("plane"): occupied-plane budgets for
    # conv2..conv4 (conv1 runs on the window engine — conv1 planes hold
    # ~1.3 of 16 cells, measured 7.6 ms/conv planek vs 3.85 window) and
    # the kernel's rank-window rows (int, or per-stage (conv2, conv3,
    # conv4) of ints / (w0, wy) pairs). Coverage is exact at 128 on the
    # synthetic Waymo chain (PERF.md round 5); misses are counted
    # (telemetry planek_miss).
    plane_budgets: Tuple[int, int, int] = (80000, 26000, 6400)
    plane_window: Any = 128
    # conv compute dtype of the dense stages ("bfloat16" halves MXU time;
    # accumulation stays f32); None keeps full f32
    dense_compute_dtype: Optional[str] = None
    # rematerialize dense-stage activations in the backward (multi-GB on
    # the Waymo grids; without it the TS train step overflows HBM)
    remat_dense: bool = True
    norm_cfg: Optional[dict] = None
    name_tag: str = "SpMiddleResNetFHD"
    is_student: bool = False
    axis_name: Optional[str] = None
    # profiling aid: truncate the forward after this stage ("conv1".."conv4")
    # and return (None, multi_scale); used by tools/profile_model.py only
    stop_after: Optional[str] = None

    @nn.compact
    def __call__(self, voxel_features, coords, train: bool = False):
        if self.engine == "column":
            return self._column_forward(voxel_features, coords, train)
        if self.engine == "window":
            return self._window_forward(voxel_features, coords, train)
        if self.engine == "plane":
            return self._plane_forward(voxel_features, coords, train)
        if self.engine == "tile":
            if self.tile_backend == "pallas" and not train:
                return self._tilek_forward(voxel_features, coords, train)
            return self._tile_forward(voxel_features, coords, train)
        an = self.axis_name
        DenseSubMStage_, DenseBasicBlock_, DenseDownsample_ = _dense_mods(train, self.remat_dense)
        valid = jnp.all(coords >= 0, axis=-1)
        x = SparseTensor(voxel_features, coords.astype(jnp.int32), valid).masked()
        v = voxel_features.shape[1]
        budgets = self.stage_budgets or (v, v, v, v)
        dfs = self.dense_from_stage if self.dense_from_stage is not None else 99

        stages = [
            # (name, channels, down stride, down padding, down ksize)
            ("conv2", 32, (2, 2, 2), (1, 1, 1), (3, 3, 3)),
            ("conv3", 64, (2, 2, 2), (1, 1, 1), (3, 3, 3)),
            ("conv4", 128, (2, 2, 2), (0, 1, 1), (3, 3, 3)),
        ]

        multi_scale = {}
        grid = self.sparse_shape
        dense_x = dense_mask = None

        if dfs <= 0:
            dense_x, dense_mask = densify(x, grid)
            dense_x = DenseSubMStage_((16,), compute_dtype=self.dense_compute_dtype, axis_name=an, name="conv_input")(
                dense_x, dense_mask, train)
            dense_x = DenseBasicBlock_(16, compute_dtype=self.dense_compute_dtype, axis_name=an, name="conv1_0")(
                dense_x, dense_mask, train)
            dense_x = DenseBasicBlock_(16, compute_dtype=self.dense_compute_dtype, axis_name=an, name="conv1_1")(
                dense_x, dense_mask, train)
            multi_scale["conv1"] = (dense_x, grid)
        else:
            idx = build_index_grid_batched(x.coords, x.valid, grid)
            nbr = subm_neighbor_table_batched(x.coords, x.valid, idx, grid)
            x = SubMStage((16,), axis_name=an, name="conv_input")(x, nbr, train)
            x = SparseBasicBlock(16, axis_name=an, name="conv1_0")(x, nbr, train)
            x = SparseBasicBlock(16, axis_name=an, name="conv1_1")(x, nbr, train)
            multi_scale["conv1"] = (x, grid)
        if self.stop_after == "conv1":
            return None, multi_scale

        for k, (name, ch, stride, pad, ksz) in enumerate(stages, start=1):
            if k <= dfs and dense_x is None:  # sparse downsample (cheap gathers)
                x, grid = SparseDownsample(
                    ch, grid, stride, pad, ksize=ksz, out_budget=budgets[k - 1],
                    axis_name=an, name=f"{name}_down",
                )(x, build_index_grid_batched(x.coords, x.valid, grid), train)
                if k == dfs:  # transition AFTER the downsample: densify the
                    # coarser output grid, not the big input grid
                    dense_x, dense_mask = densify(x, grid)
            else:
                dense_x, dense_mask = DenseDownsample_(
                    ch, stride, pad, ksize=ksz, compute_dtype=self.dense_compute_dtype, axis_name=an, name=f"{name}_down",
                )(dense_x, dense_mask, train)
                grid = conv_out_grid(grid, stride, pad, ksz)
            if dense_x is None:
                idx = build_index_grid_batched(x.coords, x.valid, grid)
                nbr = subm_neighbor_table_batched(x.coords, x.valid, idx, grid)
                x = SparseBasicBlock(ch, axis_name=an, name=f"{name}_0")(x, nbr, train)
                x = SparseBasicBlock(ch, axis_name=an, name=f"{name}_1")(x, nbr, train)
                multi_scale[name] = (x, grid)
            else:
                dense_x = DenseBasicBlock_(ch, compute_dtype=self.dense_compute_dtype, axis_name=an, name=f"{name}_0")(
                    dense_x, dense_mask, train)
                dense_x = DenseBasicBlock_(ch, compute_dtype=self.dense_compute_dtype, axis_name=an, name=f"{name}_1")(
                    dense_x, dense_mask, train)
                multi_scale[name] = (dense_x, grid)
            if self.stop_after == name:
                return None, multi_scale

        # extra_conv: z-only stride-2
        if 4 < dfs:
            x, g4 = SparseDownsample(
                128, grid, (2, 1, 1), (0, 0, 0), ksize=(3, 1, 1),
                out_budget=budgets[3], axis_name=an, name="extra_conv",
            )(x, build_index_grid_batched(x.coords, x.valid, grid), train)
            bev = sparse_to_bev(x, g4)
        else:
            if dense_x is None:
                dense_x, dense_mask = densify(x, grid)
            dense_x, dense_mask = DenseDownsample_(
                128, (2, 1, 1), (0, 0, 0), ksize=(3, 1, 1), compute_dtype=self.dense_compute_dtype,
                axis_name=an, name="extra_conv",
            )(dense_x, dense_mask, train)
            bev = dense_to_bev(dense_x)
        return bev, multi_scale

    def _dense_stream(self, st, grid):
        """Densify with the dense-stage storage dtype: bf16 when
        dense_compute_dtype is set (halves the 0.7-1.5 GB per-stage
        activation footprint; BN still computes statistics in f32). The
        sparse features are cast BEFORE the scatter so the f32 dense
        intermediate never materializes."""
        if self.dense_compute_dtype:
            cd = jnp.dtype(self.dense_compute_dtype)
            st = SparseTensor(st.features.astype(cd), st.coords, st.valid)
        return densify(st, grid)

    def _tile_forward(self, voxel_features, coords, train: bool):
        """Tile-engine forward: z-chunked BEV-tile block-sparse convs in
        the planes layout (ops/tile_planes.py; ops/tile_conv.py is the
        oracle), the contiguous/MXU-shaped TPU replacement for spconv
        rulebooks (reference scn.py:89-185). Stages >=
        ``dense_from_stage`` optionally switch to masked dense convs via
        to_dense. Natively differentiable; budget overflows and one-hot
        halo misses are sowed into the "telemetry" collection, never
        silent. Parameter tree identical to the gather engine."""
        from ...ops import tile_conv as TLC
        from ...ops import tile_planes as TP

        an = self.axis_name
        DenseSubMStage_, DenseBasicBlock_, DenseDownsample_ = _dense_mods(train, self.remat_dense)
        cd = self.dense_compute_dtype
        coords = coords.astype(jnp.int32)
        valid0 = jnp.all(coords >= 0, axis=-1)
        feats = voxel_features * valid0[..., None].astype(voxel_features.dtype)
        if cd:
            feats = feats.astype(jnp.dtype(cd))
        ty, tx = self.tile_size
        tzs = self.tile_tz
        tbud = self.tile_budgets
        grid = self.sparse_shape
        dfs = self.dense_from_stage if self.dense_from_stage is not None else 99
        # static z-chain validation (see tile_conv.tile_downsample)
        d_chain = [grid[0]]
        for pz in (1, 1, 0):
            d_chain.append((d_chain[-1] + 2 * pz - 3) // 2 + 1)
        for k in range(1, 4):
            assert 2 * tzs[k] == tzs[k - 1] or tzs[k] >= d_chain[k], (
                f"tile_tz[{k}]={tzs[k]} breaks the chunk chain at d={d_chain[k]}")
        assert tzs[3] >= d_chain[3], "conv4 z-chunk must cover the grid"

        ts, _ = jax.vmap(
            lambda c: TLC.build_tile_set(c, grid, ty, tx, tzs[0], tbud[0])
        )(coords)
        slot = jax.vmap(
            lambda c, t: TP.row_slots(c, t, grid, ty, tx, tzs[0])[0]
        )(coords, ts)
        p = jax.vmap(
            lambda f, s, t: TP.scatter_rows(f, s, t, tzs[0], ty, tx)
        )(feats, slot, ts)
        mask = jax.vmap(
            lambda s, t: TP.build_mask(s, t, tzs[0], ty, tx))(slot, ts)
        self.sow("telemetry", "conv1_tile_drop", jnp.sum(ts.n_drop))

        def densify_tiles(p_, mask_, ts_, g_, tz_):
            dx = jax.vmap(lambda yy, t: TP.to_dense(yy, t, g_, tz_))(p_, ts_)
            dm = jax.vmap(lambda mm, t: TP.to_dense(mm, t, g_, tz_))(mask_, ts_)
            return dx, dm

        dense_x = dense_mask = None
        if dfs <= 0:
            dense_x, dense_mask = densify_tiles(p, mask, ts, grid, tzs[0])
            dense_x = DenseSubMStage_((16,), compute_dtype=cd, axis_name=an,
                                     name="conv_input")(dense_x, dense_mask, train)
            dense_x = DenseBasicBlock_(16, compute_dtype=cd, axis_name=an,
                                      name="conv1_0")(dense_x, dense_mask, train)
            dense_x = DenseBasicBlock_(16, compute_dtype=cd, axis_name=an,
                                      name="conv1_1")(dense_x, dense_mask, train)
            multi_scale = {"conv1": (dense_x, grid)}
        else:
            p = TileSubMStage((16,), tz=tzs[0], axis_name=an, compute_dtype=cd,
                              name="conv_input")(p, mask, ts, train)
            p = TileBasicBlock(16, tz=tzs[0], axis_name=an, compute_dtype=cd,
                               name="conv1_0")(p, mask, ts, train)
            p = TileBasicBlock(16, tz=tzs[0], axis_name=an, compute_dtype=cd,
                               name="conv1_1")(p, mask, ts, train)
            multi_scale = {"conv1": ((p, mask, ts), grid)}
        if self.stop_after == "conv1":
            return None, multi_scale

        stages = [
            ("conv2", 32, (1, 1, 1)),
            ("conv3", 64, (1, 1, 1)),
            ("conv4", 128, (0, 1, 1)),
        ]
        for k, (name, ch, pad) in enumerate(stages, start=1):
            if k <= dfs and dense_x is None:
                p, mask, ts, grid = TileDownsample(
                    ch, tz=tzs[k - 1], tz_out=tzs[k], budget_out=tbud[k],
                    padding=pad, axis_name=an, compute_dtype=cd,
                    name=f"{name}_down")(p, mask, ts, grid, train)
                if k == dfs:  # densify the coarser output grid
                    dense_x, dense_mask = densify_tiles(p, mask, ts, grid,
                                                        tzs[k])
            else:
                dense_x, dense_mask = DenseDownsample_(
                    ch, (2, 2, 2), pad, ksize=(3, 3, 3), compute_dtype=cd,
                    axis_name=an, name=f"{name}_down")(dense_x, dense_mask, train)
                grid = conv_out_grid(grid, (2, 2, 2), pad, (3, 3, 3))
            if dense_x is None:
                p = TileBasicBlock(ch, tz=tzs[k], axis_name=an, compute_dtype=cd,
                                   name=f"{name}_0")(p, mask, ts, train)
                p = TileBasicBlock(ch, tz=tzs[k], axis_name=an, compute_dtype=cd,
                                   name=f"{name}_1")(p, mask, ts, train)
                multi_scale[name] = ((p, mask, ts), grid)
            else:
                dense_x = DenseBasicBlock_(ch, compute_dtype=cd, axis_name=an,
                                          name=f"{name}_0")(dense_x, dense_mask, train)
                dense_x = DenseBasicBlock_(ch, compute_dtype=cd, axis_name=an,
                                          name=f"{name}_1")(dense_x, dense_mask, train)
                multi_scale[name] = (dense_x, grid)
            if self.stop_after == name:
                return None, multi_scale

        if 4 < dfs and dense_x is None:
            y, m = TileZConv(128, d=grid[0], tz=tzs[3], axis_name=an,
                             compute_dtype=cd, name="extra_conv")(p, mask, train)
            g4 = ((grid[0] - 3) // 2 + 1, grid[1], grid[2])
            dense = jax.vmap(
                lambda b, t: TLC.tiles_to_dense(b, t, g4, b.shape[1])
            )(y, ts)
            bev = dense_to_bev(dense.astype(voxel_features.dtype))
        else:
            if dense_x is None:
                dense_x, dense_mask = densify_tiles(p, mask, ts, grid, tzs[3])
            dense_x, dense_mask = DenseDownsample_(
                128, (2, 1, 1), (0, 0, 0), ksize=(3, 1, 1), compute_dtype=cd,
                axis_name=an, name="extra_conv")(dense_x, dense_mask, train)
            bev = dense_to_bev(dense_x.astype(voxel_features.dtype))
        return bev, multi_scale

    def _tilek_forward(self, voxel_features, coords, train: bool):
        """Fused Pallas tile forward (inference path of the tile engine).

        Each submanifold conv of a tile stage is ONE kernel invocation —
        rank-range window DMAs, one-hot MXU selection, the whole 3x3x3 conv
        as a halo-plane matmul, folded bias+BN+ReLU+mask epilogue, and
        next-conv edge-export emission (ops/pallas/tile_block_kernel.py).
        Downsamples and stage transitions reuse the XLA planes path (same
        modules, same parameters). The parameter tree is identical to the
        XLA tile engine (TileKStage/TileKBlock are parameter twins of
        TileSubMStage/TileBasicBlock), so one checkpoint serves training
        (XLA tile path, native grads) and fused eval. Replaces the spconv
        consumption of reference det3d/models/backbones/scn.py:104-152."""
        from ...ops import tile_conv as TLC
        from ...ops import tile_kernel as TKK
        from ...ops import tile_planes as TP

        an = self.axis_name
        cd = (jnp.dtype(self.dense_compute_dtype)
              if self.dense_compute_dtype else jnp.dtype(voxel_features.dtype))
        coords = coords.astype(jnp.int32)
        valid0 = jnp.all(coords >= 0, axis=-1)
        feats = voxel_features * valid0[..., None].astype(voxel_features.dtype)
        feats = feats.astype(cd)
        b, v, c0 = feats.shape
        feats_raw = feats  # unpadded: the dfs<=0 dense branch must see the
        # true channel count or its conv_input params diverge from the XLA
        # tile path's (ADVICE r4)
        if c0 < 16:  # pad input channels so kernel piece slices stay aligned
            feats = jnp.pad(feats, ((0, 0), (0, 0), (0, 16 - c0)))
        ty, tx = self.tile_size
        assert (ty, tx) == (4, 4), "pallas tile backend needs 4x4 BEV tiles"
        tzs, tbud = self.tile_tz, self.tile_budgets
        tw = self.tilek_window
        if isinstance(tw, int):
            wins = [(tw, tw)] * 4
        else:
            wins = [(int(w), int(w)) if not isinstance(w, (tuple, list))
                    else (int(w[0]), int(w[1])) for w in tw]
        grid0 = self.sparse_shape
        dfs = self.dense_from_stage if self.dense_from_stage is not None else 99
        DenseSubMStage_, DenseBasicBlock_, DenseDownsample_ = _dense_mods(
            False, False)

        d_chain = [grid0[0]]
        for pz in (1, 1, 0):
            d_chain.append((d_chain[-1] + 2 * pz - 3) // 2 + 1)
        for k in range(1, 4):
            assert 2 * tzs[k] == tzs[k - 1] or tzs[k] >= d_chain[k], (
                f"tile_tz[{k}]={tzs[k]} breaks the chunk chain at d={d_chain[k]}")
        assert tzs[3] >= d_chain[3], "conv4 z-chunk must cover the grid"

        def fused_conv(st, exp, plan, wbb, mask16, residual, window):
            w, bias, bn = wbb
            cin_state = st.shape[-1] // 16
            if w.shape[1] < cin_state:  # zero rows for the padded channels
                w = jnp.pad(w, ((0, 0), (0, cin_state - w.shape[1]), (0, 0)))
            sc16, sh16 = TKK.fold_epilogue(
                w.shape[-1], bias=bias, bn_scale=bn[0], bn_bias=bn[1],
                bn_mean=bn[2], bn_var=bn[3], eps=1e-3)
            return TKK.tk_subm_conv(
                st, exp, plan, w, sc16, sh16, mask16, residual=residual,
                relu=True, w0=window[0], wz=window[1])

        def run_stage(st, kmask, plan, window, stage_convs, blocks):
            c = st.shape[-1] // 16
            exp = TKK.make_exports(st, tzc[0], c)
            co = (stage_convs or blocks[0])[0][0].shape[-1]
            mask16 = TKK.expand_mask(kmask, co).astype(st.dtype)
            for wbb in stage_convs:
                st, exp = fused_conv(st, exp, plan, wbb, mask16, None, window)
            for cv1, cv2 in blocks:
                res = st
                st, exp = fused_conv(st, exp, plan, cv1, mask16, None, window)
                st, exp = fused_conv(st, exp, plan, cv2, mask16, res, window)
            return st

        def mask_to_planes(kmask, t1p, tz, t1):
            m = kmask.reshape(tz, b, t1p, 16)[:, :, :t1]
            return m.transpose(1, 2, 0, 3).reshape(b, t1 * tz, 4, 4, 1)

        def densify_tiles(p_, mask_, ts_, g_, tz_):
            dx = jax.vmap(lambda yy, t: TP.to_dense(yy, t, g_, tz_))(p_, ts_)
            dm = jax.vmap(lambda mm, t: TP.to_dense(mm, t, g_, tz_))(mask_, ts_)
            return dx, dm

        # ---- conv1 stage -------------------------------------------------
        grid = grid0
        ts = jax.vmap(
            lambda c: TLC.build_tile_set(c, grid, ty, tx, tzs[0], tbud[0])[0]
        )(coords)
        self.sow("telemetry", "conv1_tile_drop", jnp.sum(ts.n_drop))
        tzc = [tzs[0]]  # current tz, carried for run_stage's exports

        multi_scale = {}
        dense_x = dense_mask = None
        if dfs <= 0:
            p0, kmask = TKK.build_state_batched(
                feats_raw, coords, ts, grid, ty, tx, tzs[0],
                TKK.t1p_of(tbud[0]))
            t1p = TKK.t1p_of(tbud[0])
            p = TKK.state_to_planes_batched(p0, b, t1p, tzs[0], tbud[0] + 1)
            mk = mask_to_planes(kmask, t1p, tzs[0], tbud[0] + 1)
            dense_x, dense_mask = densify_tiles(p, mk, ts, grid, tzs[0])
            dense_x = DenseSubMStage_((16,), compute_dtype=self.dense_compute_dtype,
                                      axis_name=an, name="conv_input")(
                dense_x, dense_mask, train)
            dense_x = DenseBasicBlock_(16, compute_dtype=self.dense_compute_dtype,
                                       axis_name=an, name="conv1_0")(
                dense_x, dense_mask, train)
            dense_x = DenseBasicBlock_(16, compute_dtype=self.dense_compute_dtype,
                                       axis_name=an, name="conv1_1")(
                dense_x, dense_mask, train)
            multi_scale["conv1"] = (dense_x, grid)
        else:
            t1p = TKK.t1p_of(tbud[0])
            state, kmask = TKK.build_state_batched(
                feats, coords, ts, grid, ty, tx, tzs[0], t1p)
            plan = TKK.make_block_plan_batched(ts, t1p, wins[0][0],
                                               wins[0][1])
            self.sow("telemetry", "tilek_miss", plan.n_miss)
            sc = TileKStage((16,), in_channels=c0, name="conv_input")()
            b1 = TileKBlock(16, in_channels=16, name="conv1_0")()
            b2 = TileKBlock(16, in_channels=16, name="conv1_1")()
            state = run_stage(state, kmask, plan, wins[0], sc, [b1, b2])
            p = TKK.state_to_planes_batched(state, b, t1p, tzs[0],
                                            tbud[0] + 1)
            mk = mask_to_planes(kmask, t1p, tzs[0], tbud[0] + 1)
            multi_scale["conv1"] = ((p, mk, ts), grid)
        if self.stop_after == "conv1":
            return None, multi_scale

        # ---- conv2..conv4 ------------------------------------------------
        stages = [
            ("conv2", 32, (1, 1, 1)),
            ("conv3", 64, (1, 1, 1)),
            ("conv4", 128, (0, 1, 1)),
        ]
        for k, (name, ch, pad) in enumerate(stages, start=1):
            if k <= dfs and dense_x is None:
                p, mk, ts, grid = TileDownsample(
                    ch, tz=tzs[k - 1], tz_out=tzs[k], budget_out=tbud[k],
                    padding=pad, axis_name=an,
                    compute_dtype=self.dense_compute_dtype,
                    name=f"{name}_down")(p, mk, ts, grid, train)
                if k == dfs:
                    dense_x, dense_mask = densify_tiles(p, mk, ts, grid,
                                                        tzs[k])
            else:
                dense_x, dense_mask = DenseDownsample_(
                    ch, (2, 2, 2), pad, ksize=(3, 3, 3),
                    compute_dtype=self.dense_compute_dtype,
                    axis_name=an, name=f"{name}_down")(dense_x, dense_mask,
                                                       train)
                grid = conv_out_grid(grid, (2, 2, 2), pad, (3, 3, 3))
            if dense_x is None:
                t1p = TKK.t1p_of(tbud[k])
                tzc[0] = tzs[k]
                state = TKK.planes_to_state_batched(p, tzs[k], t1p)
                kmask = TKK.planes_to_state_batched(mk, tzs[k], t1p)
                plan = TKK.make_block_plan_batched(ts, t1p, wins[k][0],
                                                   wins[k][1])
                self.sow("telemetry", "tilek_miss", plan.n_miss)
                bb1 = TileKBlock(ch, in_channels=ch, name=f"{name}_0")()
                bb2 = TileKBlock(ch, in_channels=ch, name=f"{name}_1")()
                state = run_stage(state, kmask, plan, wins[k], [], [bb1, bb2])
                p = TKK.state_to_planes_batched(state, b, t1p, tzs[k],
                                                tbud[k] + 1)
                mk = mask_to_planes(kmask, t1p, tzs[k], tbud[k] + 1)
                multi_scale[name] = ((p, mk, ts), grid)
            else:
                dense_x = DenseBasicBlock_(
                    ch, compute_dtype=self.dense_compute_dtype, axis_name=an,
                    name=f"{name}_0")(dense_x, dense_mask, train)
                dense_x = DenseBasicBlock_(
                    ch, compute_dtype=self.dense_compute_dtype, axis_name=an,
                    name=f"{name}_1")(dense_x, dense_mask, train)
                multi_scale[name] = (dense_x, grid)
            if self.stop_after == name:
                return None, multi_scale

        if 4 < dfs and dense_x is None:
            y, m = TileZConv(128, d=grid[0], tz=tzs[3], axis_name=an,
                             compute_dtype=self.dense_compute_dtype,
                             name="extra_conv")(p, mk, train)
            g4 = ((grid[0] - 3) // 2 + 1, grid[1], grid[2])
            dense = jax.vmap(
                lambda bb, t: TLC.tiles_to_dense(bb, t, g4, bb.shape[1])
            )(y, ts)
            bev = dense_to_bev(dense.astype(voxel_features.dtype))
        else:
            if dense_x is None:
                dense_x, dense_mask = densify_tiles(p, mk, ts, grid, tzs[3])
            dense_x, dense_mask = DenseDownsample_(
                128, (2, 1, 1), (0, 0, 0), ksize=(3, 1, 1),
                compute_dtype=self.dense_compute_dtype,
                axis_name=an, name="extra_conv")(dense_x, dense_mask, train)
            bev = dense_to_bev(dense_x.astype(voxel_features.dtype))
        return bev, multi_scale

    def _plane_stage_wins(self):
        pw = self.plane_window
        if isinstance(pw, (tuple, list)):
            assert len(pw) == 3, pw
            return [(int(w), int(w)) if not isinstance(w, (tuple, list))
                    else (int(w[0]), int(w[1])) for w in pw]
        return [(int(pw), int(pw))] * 3

    def _plane_down(self, name, state, mask, ts, grid, ch, pad, tz,
                    tz_out, tbud, tbud_out, pbud_out, train):
        """Strided transition between planek stages: plane rows -> chunk
        planes (pure row permutation), chunk-layout strided conv
        (TileDownsample / ops/tile_planes.downsample — parameter names
        match SparseDownsample) -> the next stage's plane set/state."""
        from ...ops import plane_conv as PK

        b = ts.tile_pos.shape[0]
        t1p_in = state.shape[0] // b
        sb = state.reshape(b, t1p_in, -1)
        mb = mask.reshape(b, t1p_in, 16).astype(state.dtype)
        cts = jax.vmap(
            lambda t: PK.chunk_set_of_planes(t, grid, tz, tbud))(ts)
        self.sow("telemetry", "plane_chunk_drop", jnp.sum(cts.n_drop))
        pocs = jax.vmap(
            lambda ct, t: PK.plane_ranks_of_chunks(ct, t, grid, tz,
                                                   t1p_in - 1))(cts, ts)
        pch = jax.vmap(
            lambda s, po: PK.plane_state_to_planes(s, po, tz))(sb, pocs)
        mch = jax.vmap(
            lambda m, po: PK.plane_state_to_planes(m, po, tz))(mb, pocs)
        y, mo, tso, grid_out = TileDownsample(
            ch, tz=tz, tz_out=tz_out, budget_out=tbud_out, padding=pad,
            axis_name=self.axis_name,
            compute_dtype=self.dense_compute_dtype,
            name=f"{name}_down")(pch, mch, cts, grid, train)
        t1p_out = PK.t1p_of(pbud_out)
        pts = jax.vmap(
            lambda m, t: PK.plane_set_from_chunk_mask(m, t, grid_out,
                                                      tz_out, pbud_out)
        )(mo, tso)
        self.sow("telemetry", "plane_drop", jnp.sum(pts.n_drop))
        cr = jax.vmap(
            lambda pt, t: PK.chunk_ranks_of_planes(pt, t, grid_out,
                                                   tz_out, tbud_out)
        )(pts, tso)
        st2 = jax.vmap(
            lambda yy, c: PK.planes_to_plane_state(yy, c, t1p_out))(y, cr)
        mk2 = jax.vmap(
            lambda mm, c: PK.planes_to_plane_state(mm, c, t1p_out))(mo, cr)
        return (st2.reshape(b * t1p_out, -1),
                mk2.reshape(b * t1p_out, 16), pts, grid_out)

    def _plane_forward(self, voxel_features, coords, train: bool):
        """Active-plane Pallas engine ("plane") — the shipped fast path.

        conv1 runs on the window engine (conv1 planes hold ~1.3 of 16
        cells; the plane kernel only wins from conv2 where planes
        densify — PERF.md round 5), conv2..conv4 run as fused
        plane-level Pallas subm convs (ops/pallas/plane_block_kernel.py)
        over occupied (by, bx, z) planes of 4x4 BEV tiles, with the
        strided transitions on the XLA chunk-planes path
        (ops/tile_planes.downsample) through exact row permutations.
        Trainable end-to-end: the kernels run under a custom_vjp
        (reference-vjp backward) with unfolded BatchNorm. Parameter tree
        identical to the gather engine. Replaces the spconv consumption
        of reference det3d/models/backbones/scn.py:89-185."""
        from ...ops import plane_conv as PK
        from ...ops import tile_conv as TLC
        from ...ops import window_conv as WC

        an = self.axis_name
        coords = coords.astype(jnp.int32)
        valid0 = jnp.all(coords >= 0, axis=-1)
        feats = voxel_features * valid0[..., None].astype(
            voxel_features.dtype)
        b, v, _ = feats.shape
        budgets = self.stage_budgets or (v, v, v, v)
        grid = self.sparse_shape
        cd = (jnp.dtype(self.dense_compute_dtype)
              if self.dense_compute_dtype else jnp.dtype(feats.dtype))
        wins_w = _stage_windows(self.win_window)
        pwins = self._plane_stage_wins()

        # ---- conv1 stage + conv2 downsample: window engine --------------
        feats, coords, lin = jax.vmap(
            lambda f, c: WC.sort_rows(f, c, grid))(feats, coords)
        valid = lin < WC.MISS
        plan1 = jax.vmap(
            lambda l, c: WC.make_subm_plan_presorted(l, c, grid,
                                                     window=wins_w[0])
        )(lin, coords)
        self.sow("telemetry", "win_resid", jnp.sum(plan1.n_resid))
        feats = WinSubMStage((16,), axis_name=an, name="conv_input")(
            feats, valid, plan1, train)
        feats = WinBasicBlock(16, axis_name=an, name="conv1_0")(
            feats, valid, plan1, train)
        feats = WinBasicBlock(16, axis_name=an, name="conv1_1")(
            feats, valid, plan1, train)
        multi_scale = {"conv1": (SparseTensor(feats, coords, valid), grid)}
        if self.stop_after == "conv1":
            return None, multi_scale

        feats, coords, lin, valid, grid = WinDownsample(
            32, grid, (2, 2, 2), (1, 1, 1), ksize=(3, 3, 3),
            out_budget=budgets[0], window=wins_w[1],
                resid_budget=self.win_resid_budget, axis_name=an,
            name="conv2_down")(feats, coords, lin, train)

        # ---- conv2..conv4: fused plane kernels ---------------------------
        tzs = self.tile_tz
        tbud = self.tile_budgets
        pbud = self.plane_budgets
        stages = [("conv2", 32, (1, 1, 1)), ("conv3", 64, (1, 1, 1)),
                  ("conv4", 128, (0, 1, 1))]

        state = mask = ts = None
        for k, (name, ch, pad) in enumerate(stages):
            t1p = PK.t1p_of(pbud[k])
            if k == 0:
                ts = jax.vmap(
                    lambda c: PK.build_plane_set(c, grid, pbud[0])[0]
                )(coords)
                self.sow("telemetry", "plane_drop", jnp.sum(ts.n_drop))
                state, mask = PK.build_plane_state_batched(
                    feats.astype(cd), coords, ts, grid, t1p)
            else:
                state, mask, ts, grid = self._plane_down(
                    name, state, mask, ts, grid, ch, pad,
                    tz=tzs[k], tz_out=tzs[k + 1], tbud=tbud[k],
                    tbud_out=tbud[k + 1], pbud_out=pbud[k], train=train)
            plan = PK.make_plane_plan_batched(ts, t1p, *pwins[k])
            self.sow("telemetry", "planek_miss", plan.n_miss)
            nbr = PK.flat_neighbor_ranks(ts, t1p) if train else None
            exports = (None if train else
                       PK.make_plane_exports(state, state.shape[-1] // 16))
            state, exports = PlaneKBlock(
                ch, in_channels=ch, win=pwins[k], axis_name=an,
                name=f"{name}_0")(state, exports, mask, plan, nbr, train)
            state, exports = PlaneKBlock(
                ch, in_channels=ch, win=pwins[k], axis_name=an,
                name=f"{name}_1")(state, exports, mask, plan, nbr, train)
            multi_scale[name] = ((state, mask, ts), grid)
            if self.stop_after == name:
                return None, multi_scale

        # ---- extra_conv (z-only stride-2) + BEV --------------------------
        tz4 = tzs[3]
        t1p4 = PK.t1p_of(pbud[2])
        sb = state.reshape(b, t1p4, -1)
        mb = mask.reshape(b, t1p4, 16).astype(state.dtype)
        cts = jax.vmap(
            lambda t: PK.chunk_set_of_planes(t, grid, tz4, tbud[3]))(ts)
        self.sow("telemetry", "plane_chunk_drop", jnp.sum(cts.n_drop))
        pocs = jax.vmap(
            lambda ct, t: PK.plane_ranks_of_chunks(ct, t, grid, tz4,
                                                   t1p4 - 1))(cts, ts)
        pch = jax.vmap(
            lambda s, po: PK.plane_state_to_planes(s, po, tz4))(sb, pocs)
        mch = jax.vmap(
            lambda m, po: PK.plane_state_to_planes(m, po, tz4))(mb, pocs)
        y, _ = TileZConv(128, d=grid[0], tz=tz4, axis_name=an,
                         compute_dtype=self.dense_compute_dtype,
                         name="extra_conv")(pch, mch, train)
        g4 = ((grid[0] - 3) // 2 + 1, grid[1], grid[2])
        dense = jax.vmap(
            lambda bb, t: TLC.tiles_to_dense(bb, t, g4, bb.shape[1])
        )(y, cts)
        bev = dense_to_bev(dense.astype(voxel_features.dtype))
        return bev, multi_scale

    def _window_forward(self, voxel_features, coords, train: bool):
        """Window-engine forward: sparse stages via windowed one-hot convs
        (ops/window_conv.py), the TPU-shaped replacement for spconv
        rulebooks; like the gather engine, stages >= ``dense_from_stage``
        switch to masked dense convs (at the dilated later-stage occupancies
        — 10-40% of the grid — the MXU-dense formulation is faster than any
        sparse one and needs no active-set computation). Parameter tree
        identical to the gather engine."""
        from ...ops import window_conv as WC

        an = self.axis_name
        DenseSubMStage_, DenseBasicBlock_, DenseDownsample_ = _dense_mods(train, self.remat_dense)
        coords = coords.astype(jnp.int32)
        valid0 = jnp.all(coords >= 0, axis=-1)
        feats = voxel_features * valid0[..., None].astype(voxel_features.dtype)
        v = feats.shape[1]
        budgets = self.stage_budgets or (v, v, v, v)
        grid = self.sparse_shape
        dfs = self.dense_from_stage if self.dense_from_stage is not None else 99

        feats, coords, lin = jax.vmap(
            lambda f, c: WC.sort_rows(f, c, grid))(feats, coords)
        valid = lin < WC.MISS
        wins = _stage_windows(self.win_window)

        def subm_plan(lin, coords, grid, window):
            p = jax.vmap(
                lambda l, c: WC.make_subm_plan_presorted(l, c, grid,
                                                         window=window)
            )(lin, coords)
            self.sow("telemetry", "win_resid", jnp.sum(p.n_resid))
            return p

        dense_x = dense_mask = None
        if dfs <= 0:
            dense_x, dense_mask = self._dense_stream(
                SparseTensor(feats, coords, valid), grid)
            dense_x = DenseSubMStage_((16,), compute_dtype=self.dense_compute_dtype, axis_name=an, name="conv_input")(
                dense_x, dense_mask, train)
            dense_x = DenseBasicBlock_(16, compute_dtype=self.dense_compute_dtype, axis_name=an, name="conv1_0")(
                dense_x, dense_mask, train)
            dense_x = DenseBasicBlock_(16, compute_dtype=self.dense_compute_dtype, axis_name=an, name="conv1_1")(
                dense_x, dense_mask, train)
            multi_scale = {"conv1": (dense_x, grid)}
        else:
            plan = subm_plan(lin, coords, grid, wins[0])
            feats = WinSubMStage((16,), axis_name=an, name="conv_input")(
                feats, valid, plan, train)
            feats = WinBasicBlock(16, axis_name=an, name="conv1_0")(
                feats, valid, plan, train)
            feats = WinBasicBlock(16, axis_name=an, name="conv1_1")(
                feats, valid, plan, train)
            multi_scale = {"conv1": (SparseTensor(feats, coords, valid), grid)}
        if self.stop_after == "conv1":
            return None, multi_scale

        stages = [
            ("conv2", 32, (2, 2, 2), (1, 1, 1), (3, 3, 3)),
            ("conv3", 64, (2, 2, 2), (1, 1, 1), (3, 3, 3)),
            ("conv4", 128, (2, 2, 2), (0, 1, 1), (3, 3, 3)),
        ]
        for k, (name, ch, stride, pad, ksz) in enumerate(stages, start=1):
            if k <= dfs and dense_x is None:
                feats, coords, lin, valid, grid = WinDownsample(
                    ch, grid, stride, pad, ksize=ksz,
                    out_budget=budgets[k - 1], window=wins[k],
                    resid_budget=self.win_resid_budget, axis_name=an, name=f"{name}_down",
                )(feats, coords, lin, train)
                if k == dfs:  # densify the coarser output grid
                    dense_x, dense_mask = self._dense_stream(
                        SparseTensor(feats, coords, valid), grid)
            else:
                dense_x, dense_mask = DenseDownsample_(
                    ch, stride, pad, ksize=ksz, compute_dtype=self.dense_compute_dtype, axis_name=an,
                    name=f"{name}_down",
                )(dense_x, dense_mask, train)
                grid = conv_out_grid(grid, stride, pad, ksz)
            if dense_x is None:
                plan = subm_plan(lin, coords, grid, wins[k])
                feats = WinBasicBlock(ch, axis_name=an, name=f"{name}_0")(
                    feats, valid, plan, train)
                feats = WinBasicBlock(ch, axis_name=an, name=f"{name}_1")(
                    feats, valid, plan, train)
                multi_scale[name] = (SparseTensor(feats, coords, valid), grid)
            else:
                dense_x = DenseBasicBlock_(ch, compute_dtype=self.dense_compute_dtype, axis_name=an, name=f"{name}_0")(
                    dense_x, dense_mask, train)
                dense_x = DenseBasicBlock_(ch, compute_dtype=self.dense_compute_dtype, axis_name=an, name=f"{name}_1")(
                    dense_x, dense_mask, train)
                multi_scale[name] = (dense_x, grid)
            if self.stop_after == name:
                return None, multi_scale

        if 4 < dfs:
            feats, coords, lin, valid, g4 = WinDownsample(
                128, grid, (2, 1, 1), (0, 0, 0), ksize=(3, 1, 1),
                out_budget=budgets[3], window=wins[3],
                resid_budget=self.win_resid_budget,
                axis_name=an, name="extra_conv",
            )(feats, coords, lin, train)
            bev = sparse_to_bev(SparseTensor(feats, coords, valid), g4)
        else:
            if dense_x is None:
                dense_x, dense_mask = self._dense_stream(
                    SparseTensor(feats, coords, valid), grid)
            dense_x, dense_mask = DenseDownsample_(
                128, (2, 1, 1), (0, 0, 0), ksize=(3, 1, 1), compute_dtype=self.dense_compute_dtype,
                axis_name=an, name="extra_conv",
            )(dense_x, dense_mask, train)
            bev = dense_to_bev(dense_x)
        return bev, multi_scale

    def _column_forward(self, voxel_features, coords, train: bool):
        """Column-engine forward: z-dense slabs per occupied BEV column for
        the sparse stages, masked dense 3D convs from ``dense_from_stage``.
        Same parameters and numerics as the gather engine (see
        tests/test_column_conv.py)."""
        from ...ops.column_conv import (
            build_col_table,
            col_neighbor_table,
            columns_to_dense,
            rows_to_columns,
        )

        an = self.axis_name
        DenseSubMStage_, DenseBasicBlock_, DenseDownsample_ = _dense_mods(train, self.remat_dense)
        valid = jnp.all(coords >= 0, axis=-1)
        v = voxel_features.shape[1]
        dfs = self.dense_from_stage if self.dense_from_stage is not None else 99
        # column path: sparse stages need >= 1 column stage and always
        # densify by the extra conv at the latest
        dfs = max(1, min(dfs, 4))

        grid = self.sparse_shape
        cf, cols, cvalid, zm = rows_to_columns(
            voxel_features * valid[..., None].astype(voxel_features.dtype),
            coords.astype(jnp.int32), valid, grid, v,
        )
        hw = (grid[1], grid[2])
        tbl = build_col_table(cols, cvalid, hw)
        nbr = col_neighbor_table(cols, cvalid, tbl, hw)
        cf = ColSubMStage((16,), axis_name=an, name="conv_input")(cf, zm, nbr, train)
        cf = ColBasicBlock(16, axis_name=an, name="conv1_0")(cf, zm, nbr, train)
        cf = ColBasicBlock(16, axis_name=an, name="conv1_1")(cf, zm, nbr, train)
        multi_scale = {"conv1": (cf, grid)}

        stages = [
            ("conv2", 32, 1), ("conv3", 64, 1), ("conv4", 128, 0),
        ]
        dense_x = dense_mask = None
        for k, (name, ch, z_pad) in enumerate(stages, start=1):
            d_out = (grid[0] + 2 * z_pad - 3) // 2 + 1
            if dense_x is None:
                cf, zm, cols, cvalid, hw = ColDownsample(
                    ch, hw, z_pad, d_out, axis_name=an, name=f"{name}_down",
                )(cf, zm, cols, cvalid, v, train)
                grid = (d_out, hw[0], hw[1])
                if k == dfs:
                    dense_x, dense_mask = columns_to_dense(cf, cols, cvalid, zm, grid)
                else:
                    tbl = build_col_table(cols, cvalid, hw)
                    nbr = col_neighbor_table(cols, cvalid, tbl, hw)
            else:
                dense_x, dense_mask = DenseDownsample_(
                    ch, (2, 2, 2), (z_pad, 1, 1), ksize=(3, 3, 3),
                    compute_dtype=self.dense_compute_dtype, axis_name=an,
                    name=f"{name}_down",
                )(dense_x, dense_mask, train)
                grid = conv_out_grid(grid, (2, 2, 2), (z_pad, 1, 1), (3, 3, 3))
            if dense_x is None:
                cf = ColBasicBlock(ch, axis_name=an, name=f"{name}_0")(cf, zm, nbr, train)
                cf = ColBasicBlock(ch, axis_name=an, name=f"{name}_1")(cf, zm, nbr, train)
                multi_scale[name] = (cf, grid)
            else:
                dense_x = DenseBasicBlock_(ch, compute_dtype=self.dense_compute_dtype, axis_name=an, name=f"{name}_0")(
                    dense_x, dense_mask, train)
                dense_x = DenseBasicBlock_(ch, compute_dtype=self.dense_compute_dtype, axis_name=an, name=f"{name}_1")(
                    dense_x, dense_mask, train)
                multi_scale[name] = (dense_x, grid)

        if dense_x is None:  # dfs == 4: densify right before the extra conv
            dense_x, dense_mask = columns_to_dense(cf, cols, cvalid, zm, grid)
        dense_x, dense_mask = DenseDownsample_(
            128, (2, 1, 1), (0, 0, 0), ksize=(3, 1, 1), compute_dtype=self.dense_compute_dtype,
            axis_name=an, name="extra_conv",
        )(dense_x, dense_mask, train)
        bev = dense_to_bev(dense_x)
        return bev, multi_scale


@BACKBONES.register_module
class SpMiddleFHD(nn.Module):
    """SECOND non-residual sparse backbone (reference scn.py:188-288).

    Returns (bev (B, H/8, W/8, 64*2), (conv4 SparseTensor, conv4 grid)).
    """

    num_input_features: int = 128
    sparse_shape: Tuple[int, int, int] = (41, 1504, 1504)
    stage_budgets: Optional[Tuple[int, int, int, int]] = None
    dense_from_stage: int = 2
    engine: str = "gather"
    win_window: Any = 384   # int or per-stage 4-tuple (see SpMiddleResNetFHD)
    win_resid_budget: int = 16384  # strided-plan residual rows (see above)
    dense_compute_dtype: Optional[str] = None
    remat_dense: bool = True
    norm_cfg: Optional[dict] = None
    name_tag: str = "SpMiddleFHD"
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, voxel_features, coords, train: bool = False):
        if self.engine == "window":
            return self._window_forward(voxel_features, coords, train)
        an = self.axis_name
        DenseSubMStage_, DenseBasicBlock_, DenseDownsample_ = _dense_mods(train, self.remat_dense)
        valid = jnp.all(coords >= 0, axis=-1)
        x = SparseTensor(voxel_features, coords.astype(jnp.int32), valid).masked()
        v = voxel_features.shape[1]
        budgets = self.stage_budgets or (v, v, v, v)
        dfs = self.dense_from_stage if self.dense_from_stage is not None else 99

        stages = [
            ("subm0", None, (16, 16), None, None, None),
            ("subm1", "down1", (32, 32), (2, 2, 2), (1, 1, 1), (3, 3, 3)),
            ("subm2", "down2", (64, 64, 64), (2, 2, 2), (1, 1, 1), (3, 3, 3)),
            ("subm3", "down3", (64, 64, 64), (2, 2, 2), (0, 1, 1), (3, 3, 3)),
        ]
        grid = self.sparse_shape
        dense_x = dense_mask = None
        conv4 = None
        for k, (name, down, chans, stride, pad, ksz) in enumerate(stages):
            if k >= dfs and dense_x is None and down is None:
                dense_x, dense_mask = densify(x, grid)  # dense from stage 0
            if down is not None:
                if dense_x is None:
                    x, grid = SparseDownsample(
                        chans[0], grid, stride, pad, ksize=ksz,
                        out_budget=budgets[k - 1], axis_name=an, name=down,
                    )(x, build_index_grid_batched(x.coords, x.valid, grid), train)
                    if k == dfs:  # transition after the (cheaper) sparse down
                        dense_x, dense_mask = densify(x, grid)
                else:
                    dense_x, dense_mask = DenseDownsample_(
                        chans[0], stride, pad, ksize=ksz, compute_dtype=self.dense_compute_dtype, axis_name=an, name=down,
                    )(dense_x, dense_mask, train)
                    grid = conv_out_grid(grid, stride, pad, ksz)
            if dense_x is None:
                idx = build_index_grid_batched(x.coords, x.valid, grid)
                nbr = subm_neighbor_table_batched(x.coords, x.valid, idx, grid)
                x = SubMStage(chans, axis_name=an, name=name)(x, nbr, train)
                conv4 = (x, grid)
            else:
                dense_x = DenseSubMStage_(
                    chans, compute_dtype=self.dense_compute_dtype,
                    axis_name=an, name=name)(dense_x, dense_mask, train)
                conv4 = (dense_x, grid)

        if 4 < dfs:
            x, g4 = SparseDownsample(
                64, grid, (2, 1, 1), (0, 0, 0), ksize=(3, 1, 1),
                out_budget=budgets[3], axis_name=an, name="extra_conv",
            )(x, build_index_grid_batched(x.coords, x.valid, grid), train)
            bev = sparse_to_bev(x, g4)
        else:
            if dense_x is None:
                dense_x, dense_mask = densify(x, grid)
            dense_x, dense_mask = DenseDownsample_(
                64, (2, 1, 1), (0, 0, 0), ksize=(3, 1, 1), compute_dtype=self.dense_compute_dtype,
                axis_name=an, name="extra_conv",
            )(dense_x, dense_mask, train)
            bev = dense_to_bev(dense_x)
        return bev, conv4

    def _window_forward(self, voxel_features, coords, train: bool):
        """Windowed one-hot engine for the subm stages; stages >=
        ``dense_from_stage`` switch to masked dense convs (the flagship
        pattern, see SpMiddleResNetFHD._window_forward — at the dilated
        later-stage occupancies the MXU-dense formulation wins). Same
        parameter tree as the gather engine."""
        from ...ops import window_conv as WC

        an = self.axis_name
        DenseSubMStage_, DenseBasicBlock_, DenseDownsample_ = _dense_mods(train, self.remat_dense)
        coords = coords.astype(jnp.int32)
        valid0 = jnp.all(coords >= 0, axis=-1)
        feats = voxel_features * valid0[..., None].astype(voxel_features.dtype)
        v = feats.shape[1]
        budgets = self.stage_budgets or (v, v, v, v)
        grid = self.sparse_shape
        dfs = self.dense_from_stage if self.dense_from_stage is not None else 99

        def dense_stream(st, grid):
            if self.dense_compute_dtype:
                cd = jnp.dtype(self.dense_compute_dtype)
                st = SparseTensor(st.features.astype(cd), st.coords, st.valid)
            return densify(st, grid)

        feats, coords, lin = jax.vmap(
            lambda f, c: WC.sort_rows(f, c, grid))(feats, coords)
        valid = lin < WC.MISS
        wins = _stage_windows(self.win_window)

        def subm_plan(lin, coords, grid, window):
            p = jax.vmap(
                lambda l, c: WC.make_subm_plan_presorted(
                    l, c, grid, window=window)
            )(lin, coords)
            self.sow("telemetry", "win_resid", jnp.sum(p.n_resid))
            return p

        dense_x = dense_mask = None
        if dfs <= 0:
            dense_x, dense_mask = dense_stream(
                SparseTensor(feats, coords, valid), grid)
            dense_x = DenseSubMStage_(
                (16, 16), compute_dtype=self.dense_compute_dtype,
                axis_name=an, name="subm0")(dense_x, dense_mask, train)
        else:
            plan = subm_plan(lin, coords, grid, wins[0])
            feats = WinSubMStage((16, 16), axis_name=an, name="subm0")(
                feats, valid, plan, train)
        conv4 = None

        stages = [
            ("subm1", "down1", (32, 32), (2, 2, 2), (1, 1, 1), (3, 3, 3)),
            ("subm2", "down2", (64, 64, 64), (2, 2, 2), (1, 1, 1), (3, 3, 3)),
            ("subm3", "down3", (64, 64, 64), (2, 2, 2), (0, 1, 1), (3, 3, 3)),
        ]
        for k, (name, down, chans, stride, pad, ksz) in enumerate(stages, 1):
            if k <= dfs and dense_x is None:
                feats, coords, lin, valid, grid = WinDownsample(
                    chans[0], grid, stride, pad, ksize=ksz,
                    out_budget=budgets[k - 1], window=wins[k],
                    resid_budget=self.win_resid_budget, axis_name=an, name=down,
                )(feats, coords, lin, train)
                if k == dfs:  # densify the coarser output grid
                    dense_x, dense_mask = dense_stream(
                        SparseTensor(feats, coords, valid), grid)
            else:
                dense_x, dense_mask = DenseDownsample_(
                    chans[0], stride, pad, ksize=ksz,
                    compute_dtype=self.dense_compute_dtype, axis_name=an,
                    name=down)(dense_x, dense_mask, train)
                grid = conv_out_grid(grid, stride, pad, ksz)
            if dense_x is None:
                plan = subm_plan(lin, coords, grid, wins[k])
                feats = WinSubMStage(chans, axis_name=an, name=name)(
                    feats, valid, plan, train)
                conv4 = (SparseTensor(feats, coords, valid), grid)
            else:
                dense_x = DenseSubMStage_(
                    chans, compute_dtype=self.dense_compute_dtype,
                    axis_name=an, name=name)(dense_x, dense_mask, train)
                conv4 = (dense_x, grid)

        if 4 < dfs:
            feats, coords, lin, valid, g4 = WinDownsample(
                64, grid, (2, 1, 1), (0, 0, 0), ksize=(3, 1, 1),
                out_budget=budgets[3], window=wins[3],
                resid_budget=self.win_resid_budget,
                axis_name=an, name="extra_conv",
            )(feats, coords, lin, train)
            bev = sparse_to_bev(SparseTensor(feats, coords, valid), g4)
        else:
            if dense_x is None:
                dense_x, dense_mask = dense_stream(
                    SparseTensor(feats, coords, valid), grid)
            dense_x, dense_mask = DenseDownsample_(
                64, (2, 1, 1), (0, 0, 0), ksize=(3, 1, 1),
                compute_dtype=self.dense_compute_dtype, axis_name=an,
                name="extra_conv")(dense_x, dense_mask, train)
            bev = dense_to_bev(dense_x)
        return bev, conv4
