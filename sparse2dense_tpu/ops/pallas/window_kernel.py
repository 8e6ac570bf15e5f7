"""Pallas TPU kernel for the windowed one-hot sparse conv main pass.

Same semantics as ops/window_conv.window_conv_reference's windowed part
(tests/test_window_conv.py pins reference == gather oracle; the kernel is
pinned against the reference in tests/test_window_kernel.py): for each block
of BLK output rows and each dy group, slice a W-row rank window from the
VMEM-resident sorted features, build the 9 tap one-hots by comparing window
linear keys against per-row target keys, and contract them on the MXU.

No gather instruction and no HBM DMA in the inner loop — the features and
keys live in VMEM for the whole kernel; windows are dynamic VMEM slices.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(ws_ref, base_ref, tapok_ref, gate_ref, offs_ref, lin_ref,
            feat_ref, w_ref, out_ref, *, block, window, n_in, compute_dtype):
    i = pl.program_id(0)
    cin = feat_ref.shape[1]
    cout = out_ref.shape[1]
    acc = jnp.zeros((block, cout), jnp.float32)
    for dyi in range(3):
        start = jnp.minimum(ws_ref[i, dyi], n_in - window)
        wl = lin_ref[pl.ds(start, window), :]      # (W, 1) int32
        wf = feat_ref[pl.ds(start, window), :]     # (W, Cin)
        if compute_dtype != wf.dtype:
            wf = wf.astype(compute_dtype)
        diff = wl.reshape(1, window) - base_ref[:, dyi][:, None]  # (BLK, W)
        gate = gate_ref[:, dyi][:, None] > 0
        for j in range(9):
            k = dyi * 9 + j
            hit = (diff == offs_ref[dyi, j]) \
                & (tapok_ref[:, k][:, None] > 0) & gate
            onehot = hit.astype(compute_dtype)
            g = jnp.dot(onehot, wf, preferred_element_type=jnp.float32)
            acc = acc + jnp.dot(g.astype(compute_dtype),
                                w_ref[k].astype(compute_dtype),
                                preferred_element_type=jnp.float32)
    out_ref[:] = acc.astype(out_ref.dtype)


def window_pass_pallas(features, plan, weights, *, interpret=False,
                       compute_dtype=jnp.float32):
    """The windowed main pass only (residual/bias/masking handled by the
    caller, ops/window_conv.window_conv). features (V_in, Cin) sorted;
    weights (27, Cin, Cout) in (dy, dx, dz) tap order. Returns (V_out, Cout)
    float32."""
    v_in, cin = features.shape
    cout = weights.shape[-1]
    vo = plan.out_lin.shape[0]
    nb = plan.ws.shape[0]
    block, window = plan.block_size(), plan.window_size()
    pad_vo = nb * block

    def pad_rows(x, fill=0):
        return jnp.pad(x, ((0, pad_vo - vo),) + ((0, 0),) * (x.ndim - 1),
                       constant_values=fill)

    base = pad_rows(plan.base, fill=2 ** 30 - 1)
    tapok = pad_rows(plan.tap_ok).astype(jnp.int8)
    gate = pad_rows(plan.windowed).astype(jnp.int8)
    lin2d = plan.lin.reshape(v_in, 1)

    out = pl.pallas_call(
        partial(_kernel, block=block, window=window, n_in=v_in,
                compute_dtype=compute_dtype),
        out_shape=jax.ShapeDtypeStruct((pad_vo, cout), jnp.float32),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),              # ws (nb, 3)
            pl.BlockSpec((block, 3), lambda i: (i, 0)),          # base
            pl.BlockSpec((block, 27), lambda i: (i, 0)),         # tap_ok
            pl.BlockSpec((block, 3), lambda i: (i, 0)),          # gate
            pl.BlockSpec(memory_space=pltpu.SMEM),              # offsets (3,9)
            pl.BlockSpec(memory_space=pltpu.VMEM),              # lin (V,1)
            pl.BlockSpec(memory_space=pltpu.VMEM),              # feat (V,C)
            pl.BlockSpec(memory_space=pltpu.VMEM),              # weights
        ],
        out_specs=pl.BlockSpec((block, cout), lambda i: (i, 0)),
        interpret=interpret,
    )(plan.ws, base, tapok, gate, plan.offsets, lin2d, features, weights)
    return out[:vo]
