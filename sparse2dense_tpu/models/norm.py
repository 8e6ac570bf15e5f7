"""Normalization layers.

``BatchNorm`` here follows the torch convention the reference configs use
(momentum is the update weight of the *new* batch statistic, default 0.01,
eps 1e-3 — see det3d/models/utils/norm.py via build_norm_layer), supports an
optional validity mask so padded voxels don't pollute statistics, and syncs
statistics across a mesh axis with ``lax.pmean`` when ``axis_name`` is set —
the TPU-native replacement for apex SyncBN (reference apis/train.py:281).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class BatchNorm(nn.Module):
    """Masked, mesh-syncable batch normalization over the trailing channel dim."""

    momentum: float = 0.01  # torch convention: new-stat weight
    eps: float = 1e-3
    axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, use_running_average: bool = False):
        c = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros(c, self.dtype))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones(c, self.dtype))
        scale = self.param("scale", nn.initializers.ones, (c,), self.dtype)
        bias = self.param("bias", nn.initializers.zeros, (c,), self.dtype)

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            reduce_axes = tuple(range(x.ndim - 1))
            if mask is None:
                cnt = jnp.asarray(
                    jnp.prod(jnp.array(x.shape[:-1])), jnp.float32
                )
                s = jnp.sum(xf, axis=reduce_axes)
                s2 = jnp.sum(jnp.square(xf), axis=reduce_axes)
            else:
                m = mask.astype(jnp.float32)
                cnt = jnp.sum(m) * 1.0
                s = jnp.sum(xf * m, axis=reduce_axes)
                s2 = jnp.sum(jnp.square(xf) * m, axis=reduce_axes)
            if self.axis_name is not None:
                s = jax.lax.psum(s, self.axis_name)
                s2 = jax.lax.psum(s2, self.axis_name)
                cnt = jax.lax.psum(cnt, self.axis_name)
            cnt = jnp.maximum(cnt, 1.0)
            mean = s / cnt
            var = jnp.maximum(s2 / cnt - jnp.square(mean), 0.0)

            if not self.is_initializing():
                # torch updates running_var with the unbiased estimate
                unbiased = var * cnt / jnp.maximum(cnt - 1.0, 1.0)
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased

        inv = jax.lax.rsqrt(var + self.eps)
        y = (x.astype(jnp.float32) - mean) * inv * scale + bias
        return y.astype(x.dtype)


class BNVars(nn.Module):
    """Parameter-tree twin of ``BatchNorm`` that only RETURNS its variables
    (scale, bias, running mean, running var) instead of normalizing.

    Used by fused inference paths (the Pallas tile kernel folds BN into its
    epilogue): declaring the identical names/shapes keeps checkpoints and
    param trees interchangeable with the unfused engines.
    """

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, c: int):
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros(c, self.dtype))
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones(c, self.dtype))
        scale = self.param("scale", nn.initializers.ones, (c,), self.dtype)
        bias = self.param("bias", nn.initializers.zeros, (c,), self.dtype)
        return scale, bias, mean.value, var.value


class LayerNorm2d(nn.Module):
    """Channel-wise LayerNorm on NHWC maps (reference ConvNeXt blocks use
    nn.LayerNorm over [C, H, W]; normalizing over the channel axis per
    position is the ConvNeXt-standard equivalent and is shape-agnostic)."""

    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias
