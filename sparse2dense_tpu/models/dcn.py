"""Deformable convolution v1 in pure JAX (gather-based).

TPU-native replacement for the reference's CUDA DCN
(det3d/ops/dcn/src/deform_conv_cuda_kernel.cu, wrapper ops/dcn/deform_conv.py:192):
for each kernel tap, the input is bilinearly sampled at offset positions and
the samples are contracted with the tap's weight matrix on the MXU — no
custom kernel needed. Used by FeatureAdaption / DCNSepHead
(reference models/bbox_heads/center_head.py:25-64,112-164), enabled by the
nuScenes *_dcn configs.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from .norm import BatchNorm


def _bilinear_sample_nhwc(x, ys, xs):
    """x (B,H,W,C); ys/xs (B,H,W,K): sample positions per output pixel & tap.
    Out-of-range samples contribute zero (matching the CUDA kernel)."""
    b, h, w, c = x.shape
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = ys - y0
    wx = xs - x0

    def gather(yi, xi):
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        flat = x.reshape(b, h * w, c)
        idx = (yc * w + xc).reshape(b, -1)
        g = jnp.take_along_axis(flat, idx[..., None], axis=1)
        g = g.reshape(yi.shape + (c,))
        return g * valid[..., None].astype(x.dtype)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    wy = wy[..., None]
    wx = wx[..., None]
    return (
        v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx
        + v10 * wy * (1 - wx) + v11 * wy * wx
    )


class DeformConv(nn.Module):
    """DCN v1: offsets are an input (B,H,W,2*K*groups), kernel 3x3."""

    features: int
    kernel_size: int = 3
    deformable_groups: int = 4

    @nn.compact
    def __call__(self, x, offset):
        b, h, w, cin = x.shape
        k = self.kernel_size
        kk = k * k
        g = self.deformable_groups
        weight = self.param(
            "kernel", nn.initializers.he_normal(), (kk, cin, self.features)
        )

        ys_base, xs_base = jnp.meshgrid(
            jnp.arange(h, dtype=x.dtype), jnp.arange(w, dtype=x.dtype),
            indexing="ij",
        )
        # offset layout follows the CUDA op: per group, per tap, (dy, dx)
        off = offset.reshape(b, h, w, g, kk, 2)
        cg = cin // g
        out = jnp.zeros((b, h, w, self.features), x.dtype)
        taps = [(i - (k - 1) // 2, j - (k - 1) // 2)
                for i in range(k) for j in range(k)]
        for t, (dy, dx) in enumerate(taps):
            samples = []
            for gi in range(g):
                ys = ys_base[None] + dy + off[:, :, :, gi, t, 0]
                xs = xs_base[None] + dx + off[:, :, :, gi, t, 1]
                samples.append(
                    _bilinear_sample_nhwc(x[..., gi * cg:(gi + 1) * cg], ys, xs)
                )
            s = jnp.concatenate(samples, axis=-1)  # (B,H,W,Cin)
            out = out + jnp.einsum(
                "bhwc,cd->bhwd", s, weight[t],
                preferred_element_type=jnp.float32,
            ).astype(x.dtype)
        return out


class FeatureAdaption(nn.Module):
    """(reference center_head.py:25-64): 1x1 offset conv (zero-init) + DCN."""

    features: int
    kernel_size: int = 3
    deformable_groups: int = 4

    @nn.compact
    def __call__(self, x):
        off_ch = self.deformable_groups * self.kernel_size ** 2 * 2
        offset = nn.Conv(
            off_ch, (1, 1), kernel_init=nn.initializers.zeros, name="conv_offset"
        )(x)
        x = DeformConv(
            self.features, self.kernel_size, self.deformable_groups,
            name="conv_adaption",
        )(x, offset)
        return nn.relu(x)


class DCNSepHead(nn.Module):
    """(reference center_head.py:112-164): separate deformable feature
    adaption for the heatmap and regression branches."""

    heads: tuple
    num_cls: int
    in_channels: int
    head_conv: int = 64
    final_kernel: int = 3
    init_bias: float = -2.19
    bn: bool = True
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        from .heads.center_head import SepHead, _bias_init

        center_feat = FeatureAdaption(
            self.in_channels, name="feature_adapt_cls")(x)
        reg_feat = FeatureAdaption(
            self.in_channels, name="feature_adapt_reg")(x)

        y = nn.Conv(self.head_conv, (3, 3), padding=[(1, 1)] * 2,
                    name="cls_head_conv")(center_feat)
        y = BatchNorm(axis_name=self.axis_name, name="cls_head_bn")(
            y, use_running_average=not train)
        y = nn.relu(y)
        hm = nn.Conv(self.num_cls, (3, 3), padding=[(1, 1)] * 2,
                     bias_init=_bias_init(self.init_bias), name="cls_head_out")(y)

        heads = tuple((k, v) for k, v in dict(self.heads).items() if k != "hm")
        ret = SepHead(heads=heads, head_conv=self.head_conv,
                      final_kernel=self.final_kernel, bn=self.bn,
                      axis_name=self.axis_name, name="task_head")(reg_feat, train)
        ret["hm"] = hm
        return ret
