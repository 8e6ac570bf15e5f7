"""Pallas TPU kernel for the windowed one-hot sparse conv main pass.

Same semantics as ops/window_conv._window_pass_reference (pinned against the
gather oracle in tests/test_window_conv.py and against this kernel in
tests/test_window_kernel.py): for each block of BLK=128 output rows, slice a
W-row rank window from the VMEM-resident sorted features, build the per-tap
one-hots by comparing window keys against per-row target keys, and contract
them on the MXU. No gather instruction and no HBM DMA in the inner loop.

Masking is done entirely in KEY ARITHMETIC, not kernel ops: the keys are
guard-banded (ops/window_conv.yxz_lin) so out-of-grid taps can never match,
and plan.kbase carries GATE for dy groups owned by the residual pass. The
kernel body is therefore just int32 compares + MXU dots.

The conv is issued as ONE PALLAS CALL PER dy GROUP (up to 3), with the dy
slice of ws/kbase/offsets/weights carved out by XLA so all calls share one
kernel binary; the caller sums the partial outputs.

Mosaic-compile constraints discovered on the v5e remote-compile path shaped
every layout choice here (violations => multi-minute remote compiles,
HTTP 500s, hangs, or VMEM blow-ups):
- a whole-VMEM (V, 1) int32 operand is LANE-PADDED 128x (64 MB at V=131k!);
  keys are therefore passed PACKED as (V/128, 128) row-major, which also
  forces window starts to 128-rank alignment (plan.ws is pre-divided by 128
  and multiplied back in-kernel so Mosaic can PROVE the alignment);
- a (1, 128) lane-vector cannot be relayouted to a (128, 1) sublane-vector
  (reshape/transpose both hang) — the per-row target keys are instead
  transposed ON THE MXU: split int32 into exact-in-f32 hi/lo halves, two
  identity matmuls, recombine;
- results of dynamic VMEM slices and broadcasts must be MATERIALIZED into
  scratch before fanning out to the 9 compare/dot chains, and one kernel
  must stay at ~1 dy group x 9 taps, else compile time explodes;
- no int8/bool operands, no boolean masking, no narrow blocked specs;
- whole-VMEM operands must stay under 2**23 bytes — hence bf16 window
  features (which also halve MXU time; accumulation stays fp32).

Replaces the spconv rulebook role of the reference backbone
(/root/reference/det3d/models/backbones/scn.py:89-185).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 128  # output rows per grid step; fixed by the packed-key layout
# single whole-VMEM operand byte cap of the v5e remote-compile path; the
# feature operand is channel-split to stay under it (tests shrink this to
# force splits at toy sizes)
OPERAND_BYTE_CAP = 2 ** 23


def _live_taps(ksize):
    """Static live dy groups and in-group tap indices for a (kz, ky, kx)
    kernel: dy taps exist iff ky == 3, (dx, dz) taps iff kx/kz == 3. j
    indexes the (dx, dz) pairs inside a dy group; k27 = dyi * 9 + j."""
    kz, ky, kx = ksize
    dys = (0, 1, 2) if ky == 3 else (1,)
    dxs = (0, 1, 2) if kx == 3 else (1,)
    dzs = (0, 1, 2) if kz == 3 else (1,)
    js = tuple(dxi * 3 + dzi for dxi in dxs for dzi in dzs)
    return dys, js


def _dy_kernel(ws_ref, kb_ref, offs_ref, eye_ref, lin_ref, *rest, window,
               n_in, js, compute_dtype, n_split):
    feat_refs = rest[:n_split]
    w_refs = rest[n_split:2 * n_split]
    out_ref = rest[2 * n_split]
    diff_ref = rest[2 * n_split + 1]
    wf_refs = rest[2 * n_split + 2:]
    i = pl.program_id(0)
    cout = out_ref.shape[1]
    # ws holds start/128; multiplying back makes the 128-rank (and hence
    # 16-sublane bf16) alignment of the slices provable. 1D SMEM: 2D SMEM
    # arrays pad every row to 512 B and blow the 1 MB SMEM at nb>2k.
    s128 = jnp.minimum(ws_ref[i], (n_in - window) // 128)
    for s in range(n_split):
        wf_refs[s][:] = feat_refs[s][pl.ds(s128 * 128, window), :]

    # target keys for this block arrive packed as the (1, 128) row i of
    # kb_ref; MXU-transpose them to a (BLK, 1) sublane vector via exact
    # f32 hi/lo halves (keys are < 2**27; direct relayout does not compile)
    row = kb_ref[pl.ds(i, 1), :]                       # (1, BLK) int32
    hi = (row >> 12).astype(jnp.float32)
    lo = (row & 4095).astype(jnp.float32)
    dn = (((1,), (1,)), ((), ()))
    hic = jax.lax.dot_general(eye_ref[:], hi, dn,
                              preferred_element_type=jnp.float32)
    loc = jax.lax.dot_general(eye_ref[:], lo, dn,
                              preferred_element_type=jnp.float32)
    trow = hic.astype(jnp.int32) * 4096 + loc.astype(jnp.int32)  # (BLK, 1)

    # materialize diff = window keys - target keys, 128 lanes at a time
    for br in range(window // 128):
        lrow = lin_ref[pl.ds(s128 + br, 1), :]         # (1, 128) int32
        diff_ref[:, br * 128:(br + 1) * 128] = lrow - trow

    diff = diff_ref[:]
    acc = jnp.zeros((BLK, cout), jnp.float32)
    for jx, j in enumerate(js):
        hit = (diff == offs_ref[0, j]).astype(compute_dtype)
        for s in range(n_split):
            g = jnp.dot(hit, wf_refs[s][:],
                        preferred_element_type=jnp.float32)
            acc = acc + jnp.dot(g.astype(compute_dtype),
                                w_refs[s][jx].astype(compute_dtype),
                                preferred_element_type=jnp.float32)
    out_ref[:] = acc.astype(out_ref.dtype)


def _dy_kernel_hbm(ws_ref, kb_ref, offs_ref, eye_ref, lin_ref, feat_hbm,
                   w_ref, out_ref, diff_ref, wf_ref, sem, *, window, n_in,
                   js, compute_dtype):
    """HBM-resident-features variant: the per-block rank-range window
    [ws*128, ws*128 + W) is DMA'd HBM->VMEM with two-slot double buffering
    across grid steps (scratch persists across the sequential TPU grid), so
    the feature operand never needs whole-VMEM residency. This is what lets
    the kernel take the conv2+ stages (V*C*2B = 13-20 MB there; the resident
    path's operand cap is 2**23 B — PERF.md round 3 'cannot take conv2')."""
    i = pl.program_id(0)
    nb = pl.num_programs(0)
    cout = out_ref.shape[1]
    smax = (n_in - window) // 128

    def fdma(slot, s128):
        return pltpu.make_async_copy(
            feat_hbm.at[pl.ds(s128 * 128, window), :],
            wf_ref.at[slot], sem.at[slot])

    s128 = jnp.minimum(ws_ref[i], smax)

    @pl.when(i == 0)
    def _():
        fdma(0, s128).start()

    @pl.when(i + 1 < nb)
    def _():
        s128n = jnp.minimum(ws_ref[i + 1], smax)
        fdma((i + 1) % 2, s128n).start()

    fdma(i % 2, s128).wait()

    # target keys for this block arrive as the (1, BLK) row i of kb_ref;
    # MXU-transpose to a (BLK, 1) sublane vector via exact f32 hi/lo halves
    row = kb_ref[pl.ds(i, 1), :]                       # (1, BLK) int32
    hi = (row >> 12).astype(jnp.float32)
    lo = (row & 4095).astype(jnp.float32)
    dn = (((1,), (1,)), ((), ()))
    hic = jax.lax.dot_general(eye_ref[:], hi, dn,
                              preferred_element_type=jnp.float32)
    loc = jax.lax.dot_general(eye_ref[:], lo, dn,
                              preferred_element_type=jnp.float32)
    trow = hic.astype(jnp.int32) * 4096 + loc.astype(jnp.int32)  # (BLK, 1)

    for br in range(window // 128):
        lrow = lin_ref[pl.ds(s128 + br, 1), :]         # (1, 128) int32
        diff_ref[:, br * 128:(br + 1) * 128] = lrow - trow

    diff = diff_ref[:]
    wf = wf_ref[i % 2]
    acc = jnp.zeros((BLK, cout), jnp.float32)
    for jx, j in enumerate(js):
        hit = (diff == offs_ref[0, j]).astype(compute_dtype)
        g = jnp.dot(hit, wf[:], preferred_element_type=jnp.float32)
        acc = acc + jnp.dot(g.astype(compute_dtype),
                            w_ref[jx].astype(compute_dtype),
                            preferred_element_type=jnp.float32)
    out_ref[:] = acc.astype(out_ref.dtype)


def _window_pass_hbm(features, plan, weights, *, ksize, interpret,
                     compute_dtype):
    """One pallas call per live dy group, features staying in HBM."""
    v_in, cin = features.shape
    cout = weights.shape[-1]
    vo = plan.out_lin.shape[0]
    nb = plan.ws.shape[0]
    block, window = plan.block_size(), plan.window_size()
    pad_vo = nb * block
    dys, js = _live_taps(ksize)

    v_pad = -(-v_in // 128) * 128
    lin_p = jnp.pad(plan.lin, (0, v_pad - v_in),
                    constant_values=2 ** 30).reshape(v_pad // 128, 128)
    featc = features.astype(compute_dtype)
    # the DMA'd window slides over [0, v_in): pad the feature rows so the
    # clipped start (n_in - window rounded down to 128) + window stays in
    # bounds even when v_in % 128 != 0
    featc = jnp.pad(featc, ((0, v_pad - v_in), (0, 0)))
    eye = jnp.eye(BLK, dtype=jnp.float32)

    call = pl.pallas_call(
        partial(_dy_kernel_hbm, window=window, n_in=v_pad, js=js,
                compute_dtype=compute_dtype),
        out_shape=jax.ShapeDtypeStruct((pad_vo, cout), jnp.float32),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # ws/128 dy col (nb,) 1D
            pl.BlockSpec(memory_space=pltpu.VMEM),   # kbase packed (nb, 128)
            pl.BlockSpec(memory_space=pltpu.SMEM),   # offsets dy row (1, 9)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # eye (128, 128)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # lin packed (V/128, 128)
            pl.BlockSpec(memory_space=pl.ANY),       # features stay in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),   # weights (|js|, Cin, Co)
        ],
        out_specs=pl.BlockSpec((BLK, cout), lambda i: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((BLK, window), jnp.int32),
            pltpu.VMEM((2, window, cin), compute_dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
        interpret=interpret,
    )

    out = None
    w27 = weights.reshape(3, 9, cin, cout)
    for dyi in dys:
        wdy = w27[dyi][jnp.asarray(js)].astype(compute_dtype)
        part = call(plan.ws[:, dyi] // 128,
                    plan.kbase[:, dyi].reshape(nb, BLK),
                    plan.offsets[dyi:dyi + 1, :],
                    eye, lin_p, featc, wdy)
        out = part if out is None else out + part
    return out[:vo]


def window_pass_pallas(features, plan, weights, *, ksize=(3, 3, 3),
                       interpret=False, compute_dtype=jnp.bfloat16,
                       residency="auto"):
    """The windowed main pass only (residual/bias/masking handled by the
    caller, ops/window_conv.window_conv). features (V_in, Cin) sorted;
    weights (27, Cin, Cout) in (dy, dx, dz) tap order (zeros on dead taps).
    ksize statically prunes dead taps. Returns (V_out, Cout) float32.

    One pallas call per live dy group; the dy slicing of ws / kbase /
    offsets / weights happens here in XLA so every call lowers to the same
    Mosaic kernel binary. Requires plan block_size == 128.

    ``residency``: "vmem" keeps the (channel-split) features whole-VMEM
    (fastest when they fit), "hbm" leaves them in HBM and DMAs each block's
    rank-range window (what makes the conv2+ stages kernel-eligible),
    "auto" picks by the resident operand byte cap.
    """
    v_in, cin = features.shape
    cout = weights.shape[-1]
    vo = plan.out_lin.shape[0]
    nb = plan.ws.shape[0]
    block, window = plan.block_size(), plan.window_size()
    if block != BLK:
        raise ValueError(f"pallas window engine requires block=128, "
                         f"got {block}")
    if window % 128:
        raise ValueError(f"pallas window engine requires window % 128 == 0, "
                         f"got {window}")
    if residency == "auto":
        esize = jnp.dtype(compute_dtype).itemsize
        residency = ("hbm" if v_in * cin * esize > OPERAND_BYTE_CAP
                     else "vmem")
    if residency == "hbm":
        return _window_pass_hbm(features, plan, weights, ksize=ksize,
                                interpret=interpret,
                                compute_dtype=compute_dtype)
    pad_vo = nb * block
    dys, js = _live_taps(ksize)

    # packed whole-VMEM layouts (narrow arrays are lane-padded 128x)
    v_pad = -(-v_in // 128) * 128
    lin_p = jnp.pad(plan.lin, (0, v_pad - v_in),
                    constant_values=2 ** 30).reshape(v_pad // 128, 128)
    featc = features.astype(compute_dtype)
    eye = jnp.eye(BLK, dtype=jnp.float32)

    # channel-split the resident features so each whole-VMEM operand stays
    # under the 2**23-byte cap at the dilated (200-300k row) stages
    esize = jnp.dtype(compute_dtype).itemsize
    n_split = 1
    while (cin % (2 * n_split) == 0 and
           v_in * (cin // n_split) * esize > OPERAND_BYTE_CAP):
        n_split *= 2
    csplit = cin // n_split
    feat_s = [featc[:, s * csplit:(s + 1) * csplit] for s in range(n_split)]

    call = pl.pallas_call(
        partial(_dy_kernel, window=window, n_in=v_in, js=js,
                compute_dtype=compute_dtype, n_split=n_split),
        out_shape=jax.ShapeDtypeStruct((pad_vo, cout), jnp.float32),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # ws/128 dy col (nb,) 1D
            pl.BlockSpec(memory_space=pltpu.VMEM),   # kbase dy packed (nb,128)
            pl.BlockSpec(memory_space=pltpu.SMEM),   # offsets dy row (1, 9)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # eye (128, 128)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # lin packed (V/128, 128)
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (2 * n_split),
        out_specs=pl.BlockSpec((BLK, cout), lambda i: (i, 0)),
        scratch_shapes=[pltpu.VMEM((BLK, window), jnp.int32)] +
                       [pltpu.VMEM((window, csplit), compute_dtype)] * n_split,
        # the resident key/feature operands overflow the default 16 MB
        # scoped-vmem stack at the bigger stages; keep the cap tight enough
        # that XLA does not try to keep several calls' operands live at once
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
        interpret=interpret,
    )

    out = None
    w27 = weights.reshape(3, 9, cin, cout)
    for dyi in dys:
        wdy = w27[dyi][jnp.asarray(js)]   # (|js|, cin, cout)
        w_s = [wdy[:, s * csplit:(s + 1) * csplit, :] for s in range(n_split)]
        part = call(plan.ws[:, dyi] // 128,
                    plan.kbase[:, dyi].reshape(nb, BLK),
                    plan.offsets[dyi:dyi + 1, :],
                    eye, lin_p, *feat_s, *w_s)
        out = part if out is None else out + part
    return out[:vo]
