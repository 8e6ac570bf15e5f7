"""S2D_RPN: the Sparse2Dense densification neck for voxel models.

Rebuild of the reference S2D_RPN (det3d/models/necks/rpn.py:165-337) in NHWC:

- S2D module: encoder_1 (stride-2 k2 conv) -> encoder_2 (stride-2) -> 3
  ConvNeXt blocks -> decoder_1 (2x up) + skip concat -> decoder_2 (2x up)
  producing the dense feature F_S_b; F_S_a = fusion_dense(F_S_b) +
  fusion_sparse(x) (reference :311).
- PCR module (train only): out_conv 1x1 -> 640ch, reshaped to a 5-deep 3D
  volume (N, 5, H, W, 128), then 3D transpose-conv generators emitting
  occupancy logits ``gen_mask_{2,4}`` and point offsets ``gen_offset_{2,4}``
  at 1/4 and 1/2 resolution (reference :263-297,314-323).
- The RPN trunk then runs on F_S_a. forward returns the same 7-tuple as the
  reference (:337).

Deviation (documented): the reference's ConvNeXt LayerNorm normalizes over
the full (C, H, W) volume with a shape-bound affine (nn.LayerNorm([256,47,47]))
which hard-codes the grid; we use the ConvNeXt-standard per-position channel
LayerNorm, which is shape-agnostic and TPU-friendly.
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..norm import BatchNorm, LayerNorm2d
from ..registry import NECKS
from .rpn import RPN


class ConvBNGelu(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    padding: int = 1
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(
            self.features, (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(self.padding, self.padding)] * 2,
            name="conv",
        )(x)
        x = BatchNorm(axis_name=self.axis_name, name="norm")(
            x, use_running_average=not train
        )
        return nn.gelu(x)


class ConvTBNGelu(nn.Module):
    """ConvTranspose 2x upsampling + BN + GELU (torch k4/s2/p1 == flax SAME)."""

    features: int
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.ConvTranspose(
            self.features, (4, 4), strides=(2, 2), padding="SAME",
            name="conv",
        )(x)
        x = BatchNorm(axis_name=self.axis_name, name="norm")(
            x, use_running_average=not train
        )
        return nn.gelu(x)


class ConvNeXtBlock(nn.Module):
    """Depthwise 7x7 -> LN -> 1x1 4x expand -> GELU -> 1x1 project."""

    features: int

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(
            self.features, (7, 7), padding=[(3, 3)] * 2,
            feature_group_count=self.features, name="dwconv",
        )(x)
        y = LayerNorm2d(name="norm")(y)
        y = nn.Conv(self.features * 4, (1, 1), name="pw1")(y)
        y = nn.gelu(y)
        y = nn.Conv(self.features, (1, 1), name="pw2")(y)
        return y


class Conv3dBNAct(nn.Module):
    features: int
    act: str = "relu"
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(self.features, (1, 1, 1), name="conv")(x)
        x = BatchNorm(axis_name=self.axis_name, name="norm")(
            x, use_running_average=not train
        )
        return nn.relu(x) if self.act == "relu" else nn.gelu(x)


class ConvT3dBNRelu(nn.Module):
    """3D ConvTranspose 2x upsampling (torch k4/s2/p1 == flax SAME)."""

    features: int
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.ConvTranspose(
            self.features, (4, 4, 4), strides=(2, 2, 2),
            padding="SAME", name="conv",
        )(x)
        x = BatchNorm(axis_name=self.axis_name, name="norm")(
            x, use_running_average=not train
        )
        return nn.relu(x)


# ---------------------------------------------------------------------------
# z-FOLDED PCR building blocks
#
# The PCR volumes are shallow (D = 5/10/20) with NARROW channels (3/1 at the
# heads); on TPU a (B, D, H, W, C<=32) NDHWC tensor pads its minor dim to the
# 128-lane tile, so the generator's 752^2-resolution outputs materialize at
# 13-42x their logical bytes in the backward (the ~2 GB HBM overshoot of the
# full-grid single-chip TS step, PERF.md). These modules keep every PCR
# tensor in the FOLDED layout (B, H, W, D*C) (z-major channel blocks:
# channel = d*C + c) so the minor dim is wide, while creating parameters
# with EXACTLY the names/shapes of the 5D modules above — checkpoints
# interchange, and math parity is pinned in tests/test_pcr_folded.py.
# ---------------------------------------------------------------------------


class _ConvParams(nn.Module):
    """Parameter twin of nn.Conv/nn.ConvTranspose (kernel + bias only)."""

    kshape: tuple

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       self.kshape)
        b = self.param("bias", nn.initializers.zeros, (self.kshape[-1],))
        return k, b


class FoldedBatchNorm(nn.Module):
    """BatchNorm over folded (B, H, W, D*C): statistics per channel c
    shared across the D z-blocks — identical math to BatchNorm over the
    unfolded (B, D, H, W, C), with variables of the same names/shapes."""

    d: int
    momentum: float = 0.01
    eps: float = 1e-3
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, use_running_average: bool = False):
        dd = self.d
        c = x.shape[-1] // dd
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(c, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(c, jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            # spatial reduce on the well-tiled folded tensor FIRST; the
            # (D, C) fold happens on a tiny (D*C,) vector
            s = jnp.sum(xf, axis=(0, 1, 2)).reshape(dd, c).sum(0)
            s2 = jnp.sum(jnp.square(xf), axis=(0, 1, 2)).reshape(dd, c).sum(0)
            cnt = jnp.asarray(
                np.prod(x.shape[:-1]) * dd, jnp.float32)
            if self.axis_name is not None:
                s = jax.lax.psum(s, self.axis_name)
                s2 = jax.lax.psum(s2, self.axis_name)
                cnt = jax.lax.psum(cnt, self.axis_name)
            mean = s / cnt
            var = jnp.maximum(s2 / cnt - jnp.square(mean), 0.0)
            if not self.is_initializing():
                unbiased = var * cnt / jnp.maximum(cnt - 1.0, 1.0)
                ra_mean.value = (1 - self.momentum) * ra_mean.value \
                    + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value \
                    + self.momentum * unbiased

        inv = jax.lax.rsqrt(var + self.eps)
        y = (x.astype(jnp.float32) - jnp.tile(mean, dd)) \
            * jnp.tile(inv * scale, dd) + jnp.tile(bias, dd)
        return y.astype(x.dtype)


def _blockdiag_1x1(k: jnp.ndarray, d: int) -> jnp.ndarray:
    """(1,1,1,Cin,Cout) shared 1x1x1 taps -> (D*Cin, D*Cout) block-diagonal
    matrix applying them per z-block of a folded tensor."""
    cin, cout = k.shape[-2], k.shape[-1]
    w2 = k.reshape(cin, cout)
    eye = jnp.eye(d, dtype=k.dtype)
    return jnp.einsum("de,io->dieo", eye, w2).reshape(d * cin, d * cout)


class FoldedConv1x1(nn.Module):
    """1x1x1 Conv3d on a folded (B, H, W, D*Cin) tensor (parameter names
    and shapes = nn.Conv(features, (1,1,1)))."""

    features: int
    d: int

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1] // self.d
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (1, 1, 1, cin, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        y = jnp.einsum("bhwi,io->bhwo", x, _blockdiag_1x1(k, self.d))
        return y + jnp.tile(b, self.d)


class FoldedConv3dBNAct(nn.Module):
    """Folded twin of Conv3dBNAct (param tree: conv/{kernel,bias},
    norm/{scale,bias} + batch_stats)."""

    features: int
    d: int
    act: str = "relu"
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool):
        cin = x.shape[-1] // self.d
        k, b = _ConvParams((1, 1, 1, cin, self.features), name="conv")()
        y = jnp.einsum("bhwi,io->bhwo", x, _blockdiag_1x1(k, self.d))
        y = y + jnp.tile(b, self.d)
        y = FoldedBatchNorm(self.d, axis_name=self.axis_name, name="norm")(
            y, use_running_average=not train)
        return nn.relu(y) if self.act == "relu" else nn.gelu(y)


def _tconv_zmap(d: int) -> np.ndarray:
    """(4, D, 2D) 0/1 z-coupling of lax.conv_transpose(k=4, s=2, SAME):
    out[o] += in[i] * K[kz] where o = 2i + 2 - kz (pad_a = 2, kernel NOT
    flipped — pinned vs nn.ConvTranspose in tests/test_pcr_folded.py)."""
    kz = np.arange(4)[:, None, None]
    i = np.arange(d)[None, :, None]
    o = np.arange(2 * d)[None, None, :]
    return (o == 2 * i + 2 - kz).astype(np.float32)


class FoldedConvT3dBNRelu(nn.Module):
    """Folded twin of ConvT3dBNRelu: the z part of the 4x4x4/s2 transpose
    conv becomes a block-banded (4, 4, D*Cin, 2D*Cout) weight on a 2D
    conv_transpose; the H/W part is byte-identical to flax ConvTranspose
    SAME. Input (B, H, W, D*Cin) -> (B, 2H, 2W, 2D*Cout)."""

    features: int
    d: int
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool):
        dd = self.d
        cin = x.shape[-1] // dd
        k, b = _ConvParams((4, 4, 4, cin, self.features), name="conv")()
        m = jnp.asarray(_tconv_zmap(dd), k.dtype)
        wbig = jnp.einsum("kio,kyxab->yxiaob", m, k).reshape(
            4, 4, dd * cin, 2 * dd * self.features)
        y = jax.lax.conv_transpose(
            x, wbig.astype(x.dtype), (2, 2), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = y + jnp.tile(b, 2 * dd).astype(y.dtype)
        y = FoldedBatchNorm(2 * dd, axis_name=self.axis_name,
                            name="norm")(y, use_running_average=not train)
        return nn.relu(y)


@NECKS.register_module
class S2D_RPN(RPN):
    """Returns (rpn_out, gen_offset_2, gen_mask_2, gen_offset_4, gen_mask_4,
    F_S_a, F_S_b); PCR outputs are z-FOLDED (B, H, W, D*C) (offsets C=3,
    mask logits C=1; see the folded-module block above) and None at eval,
    matching reference rpn.py:300-337 semantics with TPU-native layout."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_in = self.num_input_features
        an = self.axis_name

        # ---- S2D module ----
        y1 = ConvBNGelu(256, kernel=2, stride=2, padding=0, axis_name=an,
                        name="encoder_1a")(x, train)
        y1 = ConvBNGelu(256, axis_name=an, name="encoder_1b")(y1, train)
        y2 = ConvBNGelu(256, stride=2, axis_name=an, name="encoder_2a")(y1, train)
        y2 = ConvBNGelu(256, axis_name=an, name="encoder_2b")(y2, train)

        att = ConvNeXtBlock(256, name="convnext_1")(y2) + y2
        att = ConvNeXtBlock(256, name="convnext_2")(att) + att
        att = nn.gelu(ConvNeXtBlock(256, name="convnext_3")(att) + att)

        up1 = ConvTBNGelu(256, axis_name=an, name="decoder_1")(att, train)
        y3 = jnp.concatenate([up1, y1], axis=-1)
        f_s_b = ConvBNGelu(256, axis_name=an, name="decoder_2a")(y3, train)
        f_s_b = ConvTBNGelu(c_in, axis_name=an, name="decoder_2b")(f_s_b, train)

        f_s_a = (
            ConvBNGelu(c_in, kernel=1, padding=0, axis_name=an, name="fusion_dense")(f_s_b, train)
            + ConvBNGelu(c_in, kernel=1, padding=0, axis_name=an, name="fusion_sparse")(x, train)
        )

        # ---- PCR module (train only; rematerialized: its narrow-channel
        # NDHWC conv outputs otherwise persist for the backward in badly
        # padded layouts — a 1-channel mask map cost 5.4 GB saved) ----
        if train:
            pcr = nn.remat(S2D_RPN._pcr, static_argnums=(3,))
            (gen_offset_2, gen_mask_2, gen_offset_4, gen_mask_4) = pcr(
                self, x, f_s_b, train)
        else:
            gen_offset_2 = gen_mask_2 = gen_offset_4 = gen_mask_4 = None

        # ---- RPN trunk on the fused feature ----
        out, _ = self.trunk_and_ups(f_s_a, train)
        return out, gen_offset_2, gen_mask_2, gen_offset_4, gen_mask_4, f_s_a, f_s_b

    def _pcr(self, x, f_s_b, train):
        """PCR generators (reference rpn.py:300-337) in the z-FOLDED layout
        (B, H, W, D*C): same math and identical parameter tree as the 5D
        formulation (pinned in tests/test_pcr_folded.py), but every tensor
        keeps a wide minor dim so the 752^2-scale outputs stop padding
        13-42x in the TS backward (the single-chip HBM overshoot)."""
        an = self.axis_name
        b, h, w, _ = x.shape
        gen = ConvBNGelu(640, kernel=1, padding=0, axis_name=an, name="out_conv")(
            f_s_b, train
        )
        # torch view(N,128,5,H,W) reads channel m as (c=m//5, d=m%5); the
        # folded layout wants channel j = d*128 + c — a static permutation
        perm = np.arange(640)
        perm = (perm % 128) * 5 + perm // 128
        gen = jnp.take(gen, jnp.asarray(perm), axis=-1)  # (B,H,W,5*128)
        gen = FoldedConv3dBNAct(32, d=5, axis_name=an,
                                name="generator_1a")(gen, train)
        gen = FoldedConvT3dBNRelu(32, d=5, axis_name=an,
                                  name="generator_1b")(gen, train)
        gen_offset_4 = FoldedConv1x1(3, d=10, name="gen_out_4")(gen)
        gen_mask_4 = FoldedConv1x1(1, d=10, name="gen_mask_4")(gen)
        gen = FoldedConv3dBNAct(16, d=10, axis_name=an,
                                name="generator_2a")(gen, train)
        gen = FoldedConvT3dBNRelu(3, d=10, axis_name=an,
                                  name="generator_2b")(gen, train)
        gen_offset_2 = FoldedConv1x1(3, d=20, name="gen_out_2")(gen)
        gen_mask_2 = FoldedConv1x1(1, d=20, name="gen_mask_2")(gen)
        return gen_offset_2, gen_mask_2, gen_offset_4, gen_mask_4
