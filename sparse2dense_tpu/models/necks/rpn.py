"""RPN neck: multi-scale conv trunk + transpose-conv upsample + concat.

Functional rebuild of the reference RPN (det3d/models/necks/rpn.py:25-162)
in NHWC. Each downsample block is [conv3x3(stride) BN ReLU] followed by
``layer_num`` [conv3x3 BN ReLU] units (the reference defers the last ReLU to
``F.relu(block(x))`` in forward — same function). Upsample branches are
ConvTranspose(stride=kernel) or strided conv for fractional strides, then the
branches concat on channels.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax.numpy as jnp
from flax import linen as nn

from ..norm import BatchNorm
from ..registry import NECKS


class ConvBNReLU(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    padding: int = 1
    use_bias: bool = False
    axis_name: Optional[str] = None
    transpose: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        if self.transpose:
            x = nn.ConvTranspose(
                self.features,
                (self.kernel, self.kernel),
                strides=(self.stride, self.stride),
                padding="VALID",
                use_bias=self.use_bias,
                name="conv",
            )(x)
        else:
            x = nn.Conv(
                self.features,
                (self.kernel, self.kernel),
                strides=(self.stride, self.stride),
                padding=[(self.padding, self.padding)] * 2,
                use_bias=self.use_bias,
                name="conv",
            )(x)
        x = BatchNorm(axis_name=self.axis_name, name="norm")(
            x, use_running_average=not train
        )
        return nn.relu(x)


class RPNBlock(nn.Module):
    features: int
    num_layers: int
    stride: int
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool):
        x = ConvBNReLU(
            self.features, stride=self.stride, axis_name=self.axis_name, name="down"
        )(x, train)
        for j in range(self.num_layers):
            x = ConvBNReLU(self.features, axis_name=self.axis_name, name=f"conv_{j}")(
                x, train
            )
        return x


class RPNDeblock(nn.Module):
    features: int
    stride: float
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool):
        if self.stride >= 1:
            s = int(self.stride)
            if s > 1:
                return ConvBNReLU(
                    self.features, kernel=s, stride=s, transpose=True,
                    axis_name=self.axis_name, name="up",
                )(x, train)
            return ConvBNReLU(
                self.features, kernel=1, stride=1, padding=0,
                axis_name=self.axis_name, name="up",
            )(x, train)
        s = int(round(1 / self.stride))
        return ConvBNReLU(
            self.features, kernel=s, stride=s, padding=0,
            axis_name=self.axis_name, name="up",
        )(x, train)


@NECKS.register_module
class RPN(nn.Module):
    layer_nums: Sequence[int] = (3, 5, 5)
    ds_layer_strides: Sequence[int] = (1, 2, 2)
    ds_num_filters: Sequence[int] = (64, 128, 256)
    us_layer_strides: Sequence[float] = (1, 2, 4)
    us_num_filters: Sequence[int] = (128, 128, 128)
    num_input_features: int = 64
    norm_cfg: Optional[dict] = None
    logger: Optional[object] = None
    axis_name: Optional[str] = None

    @property
    def downsample_factor(self):
        factor = np.prod(self.ds_layer_strides)
        if len(self.us_layer_strides) > 0:
            factor /= self.us_layer_strides[-1]
        return factor

    def trunk_and_ups(self, x, train: bool):
        """Shared body; returns (concat_ups, list_of_stage_outputs)."""
        upsample_start = len(self.layer_nums) - len(self.us_layer_strides)
        ups, stages = [], []
        for i, n in enumerate(self.layer_nums):
            x = RPNBlock(
                self.ds_num_filters[i], n, self.ds_layer_strides[i],
                axis_name=self.axis_name, name=f"block_{i}",
            )(x, train)
            stages.append(x)
            if i - upsample_start >= 0:
                j = i - upsample_start
                ups.append(
                    RPNDeblock(
                        self.us_num_filters[j], self.us_layer_strides[j],
                        axis_name=self.axis_name, name=f"deblock_{j}",
                    )(x, train)
                )
        out = jnp.concatenate(ups, axis=-1) if ups else x
        return out, stages

    @nn.compact
    def __call__(self, x, train: bool = False):
        out, _ = self.trunk_and_ups(x, train)
        return out
