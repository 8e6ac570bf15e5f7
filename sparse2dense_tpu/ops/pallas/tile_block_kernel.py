"""Pallas TPU kernel for the tile engine's submanifold 3x3x3 conv.

This is the round-4 kernel that replaces ops/tile_planes.py's XLA glue
(one-hot halo imports, edge-correction slice adds, z-shift channel slices
— measured 30-100x the conv cost in context, PERF.md round 3) with ONE
pallas call per conv. Same tile semantics as ops/tile_planes.subm_conv
(fixed z-chunks, 26-direction exact neighborhoods, lexicographic tile
ranks); parity is pinned in tests/test_tile_kernel.py.

Core ideas:

- TILE RANKS ARE LEXICOGRAPHIC in (bz, by, bx), so for a block of 128
  consecutive tiles the neighbor ranks of each (dz, dy) BEV-ROW CLUSTER
  fall in a narrow, monotone rank window (measured p99 ~ 1.2x block size
  for same-layer rows; z-side rows are wider where layer densities
  differ). Each block therefore fetches NINE contiguous rank-range DMA
  windows — (dz, dy) in {-1,0,1}^2 — from nine per-cluster EXPORT arrays,
  plus its own 128 feature rows. No gather instruction anywhere. Targets
  outside their window are dropped AND pre-counted by the plan builder
  (ops/tile_kernel.make_block_plan) — never silent.

- EXPORTS ARE GROUPED BY CONSUMER: the array a (dz, dy) cluster DMAs
  holds exactly the pieces those directions read (e.g. the dy=-1
  same-layer cluster reads [yhi | cxx | cx0]), so windows stay narrow AND
  every fetched byte is a candidate payload.

- IN-VMEM SELECTION IS A ONE-HOT MATMUL: hit_d (128, W) compares the
  window's rank iota against each tile's neighbor rank for direction d;
  hit_d @ window[:, piece_cols] lands the piece at MXU speed (same trick
  as ops/pallas/window_kernel.py).

- THE WHOLE 3x3x3 CONV IS ONE MATMUL PER Z-PLANE: the per-(tile, z) conv
  input is the 36-cell halo plane [16 own | 4 xm | 4 xp | 6 ym | 6 yp]
  assembled as MATMUL COLUMNS (P3[z] (128, 36C)), and U[z] = P3[z] @
  Wmain with Wmain (36C, 3*16Co) the z-packed halo-plane weight matrix
  (ops/tile_kernel.build_wmain). The z taps combine by STATIC ROW-BLOCK
  shifts of U (state is z-major: z +- 1 is a 128-row offset — no strided
  slicing), with the two out-of-chunk z levels supplied by two more
  (128, 36C) @ (36C, 16Co) matmuls on gathered neighbor z-planes.

- ALL TEN DMAs ARE DOUBLE-BUFFERED across grid steps (scratch persists;
  step i prefetches i+1's windows before computing), so the sequential
  window traffic hides under the MXU work.

- THE EPILOGUE IS FUSED: out = relu((conv + bias) * bn_scale + bn_shift
  [+ residual]) * mask (scale/shift/mask pre-tiled to the 16Co row
  layout), and the NEXT conv's nine export arrays are emitted from the
  same VMEM block — the dense-stage elementwise passes over GB-scale
  activations (268 ms measured round 3) disappear.

Replaces the spconv rulebook+conv role of the reference backbone
(/root/reference/det3d/models/backbones/scn.py:89-185, spconv consumed at
:104-152).

Mosaic rules obeyed (learned rounds 2-4): no whole-VMEM narrow operands;
window/DMA buffer widths padded to 128 lanes (ops/tile_kernel pads the
export arrays to match); no reshapes that regroup lanes (per-z matmuls
instead of a (tz*128, 36C) flatten); the (32, 128) target block is
MXU-transposed via an f32 identity matmul (exact: ranks < 2**24, the
sentinel is a power of two); 32-bit matmul accumulation everywhere.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 128          # tiles per grid step
SENTINEL = 2 ** 30  # target rank that never matches a window rank
GRAN = 16          # window-start granule (bf16 sublane rule)


def _pad128(w):
    return -(-w // 128) * 128


# ---------------------------------------------------------------------------
# export-array layouts: one array per (dz, dy) consumer cluster
# ---------------------------------------------------------------------------
# cluster index: ci = (dz+1)*3 + (dy+1)
# same-layer clusters (dz=0) hold z-major full-height pieces; z-side
# clusters hold single-plane pieces of the tile's top (EZT, consumed by
# dz=-1 dirs of the layer above) / bottom (EZB, consumed by dz=+1 dirs of
# the layer below) plane.

def cluster_pieces(C, tz, ci):
    """[(dir_dx, piece_offset, piece_width)] and padded row width for the
    export array of cluster ci. Piece cell orders: rows/cols are z-major
    (z, y|x, c) for dz=0, (y|x, c) for z-side; corners (z, c) / (c,)."""
    dz = ci // 3 - 1
    dy = ci % 3 - 1
    if dz == 0:
        s4, s1 = 4 * C * tz, C * tz
        if dy == 0:
            # dirs (0,0,-1) reads xhi; (0,0,+1) reads xlo
            pieces = [(-1, 0, s4), (1, s4, s4)]
            width = 2 * s4
        elif dy == -1:
            # ym_ext: (0,-1,0)->yhi, (0,-1,-1)->cxx, (0,-1,+1)->cx0
            pieces = [(0, 0, s4), (-1, s4, s1), (1, s4 + s1, s1)]
            width = s4 + 2 * s1
        else:
            # yp_ext: (0,+1,0)->ylo, (0,+1,-1)->c0x, (0,+1,+1)->c00
            pieces = [(0, 0, s4), (-1, s4, s1), (1, s4 + s1, s1)]
            width = s4 + 2 * s1
    else:
        s16, s4, s1 = 16 * C, 4 * C, C
        if dy == 0:
            # (dz,0,0)->plane, (dz,0,-1)->pxhi, (dz,0,+1)->pxlo
            pieces = [(0, 0, s16), (-1, s16, s4), (1, s16 + s4, s4)]
            width = s16 + 2 * s4
        elif dy == -1:
            # (dz,-1,0)->pyhi, (dz,-1,-1)->pcxx, (dz,-1,+1)->pcx0
            pieces = [(0, 0, s4), (-1, s4, s1), (1, s4 + s1, s1)]
            width = s4 + 2 * s1
        else:
            pieces = [(0, 0, s4), (-1, s4, s1), (1, s4 + s1, s1)]
            width = s4 + 2 * s1
    return pieces, _pad128(width)


def cluster_widths(C, tz):
    return [cluster_pieces(C, tz, ci)[1] for ci in range(9)]


# target columns inside a 36C halo-plane row: [interior 16C | xm 4C |
# xp 4C | ym_ext 6C | yp_ext 6C]; ym_ext = [cxx | yhi row | cx0] in x
# order -1..4, yp_ext = [c0x | ylo row | c00]
def halo_cols(C):
    return {"int": (0, 16 * C), "xm": (16 * C, 4 * C), "xp": (20 * C, 4 * C),
            "ym_c0": (24 * C, C), "ym_r": (25 * C, 4 * C),
            "ym_c1": (29 * C, C),
            "yp_c0": (30 * C, C), "yp_r": (31 * C, 4 * C),
            "yp_c1": (35 * C, C)}


# (cluster dy, piece dx) -> halo target column for same-layer and z-side
# rings (identical structure: the z-side "interior" is the gathered plane)
def _ring_targets(dy, dx):
    if dy == 0:
        return {(-1): "xm", (1): "xp", (0): "int"}[dx]
    if dy == -1:
        return {0: "ym_r", -1: "ym_c0", 1: "ym_c1"}[dx]
    return {0: "yp_r", -1: "yp_c0", 1: "yp_c1"}[dx]


# dir row index inside the plan's (nb, 32, 128) target block
def dir_row(dz, dy, dx):
    return ((dz + 1) * 3 + (dy + 1)) * 3 + (dx + 1)


def _tile_kernel(ws_ref, tgt_ref, eye_ref, f_hbm, *rest, tz, C, Co, Ws, T1p,
                 relu, has_resid, compute_dtype, skip=()):
    exp_hbm = rest[:9]
    rest = rest[9:]
    (wmain_ref, mzm_ref, mzp_ref, scale_ref, shift_ref) = rest[:5]
    rest = rest[5:]
    if has_resid:
        mask_ref, resid_ref = rest[:2]
        rest = rest[2:]
    else:
        mask_ref, resid_ref = rest[0], None
        rest = rest[1:]
    out_refs = rest[:10]          # state out + 9 export outs
    scratch = rest[10:]
    p3, pzm, pzp, u_sc, fbuf = scratch[:5]
    wins = scratch[5:14]
    sems = scratch[14]
    out_ref = out_refs[0]
    i = pl.program_id(0)
    nb = pl.num_programs(0)
    hc = halo_cols(C)
    co16 = 16 * Co
    cw = [cluster_pieces(C, tz, ci) for ci in range(9)]

    # ---- double-buffered DMAs: center rows + 9 cluster windows ----------
    def dmas(step, slot):
        ws = []
        for ci in range(9):
            smax = (T1p - Ws[ci]) // GRAN
            s = jnp.minimum(ws_ref[step * 9 + ci], smax) * GRAN
            ws.append(s)
        cp = [pltpu.make_async_copy(
            exp_hbm[ci].at[pl.ds(ws[ci], Ws[ci]), :],
            wins[ci].at[slot], sems.at[slot * 10 + ci]) for ci in range(9)]
        cp.append(pltpu.make_async_copy(
            f_hbm.at[:, pl.ds(step * BLK, BLK), :], fbuf.at[slot],
            sems.at[slot * 10 + 9]))
        return ws, cp

    @pl.when(i == 0)
    def _():
        _, cp = dmas(0, 0)
        for c in cp:
            c.start()

    @pl.when(i + 1 < nb)
    def _():
        _, cp = dmas(i + 1, (i + 1) % 2)
        for c in cp:
            c.start()

    slot = i % 2
    ws, cp = dmas(i, slot)
    for c in cp:
        c.wait()

    # ---- per-tile neighbor ranks, MXU-transposed to (128, 32) ----------
    tgtf = tgt_ref[0].astype(jnp.float32)                # (32, 128)
    dn = (((1,), (1,)), ((), ()))
    tgtT = jax.lax.dot_general(eye_ref[:], tgtf, dn,
                               preferred_element_type=jnp.float32)
    tgtT = tgtT.astype(jnp.int32)                        # (128, 32) ranks

    def hit(dz, dy, dx):
        ci = (dz + 1) * 3 + (dy + 1)
        ranks = ws[ci] + jax.lax.broadcasted_iota(jnp.int32, (1, Ws[ci]), 1)
        h = (tgtT[:, dir_row(dz, dy, dx):dir_row(dz, dy, dx) + 1] == ranks)
        return h.astype(compute_dtype)                   # (128, W)

    # ---- gather z-side halo planes and same-layer ring pieces ----------
    for dz, pref in ((-1, pzm), (1, pzp)):
        for dy in (-1, 0, 1):
            ci = (dz + 1) * 3 + (dy + 1)
            win = wins[ci][slot]
            for dx, off, wd in cw[ci][0]:
                if "zsides" in skip:
                    continue
                h = hit(dz, dy, dx)
                c0, cl = hc[_ring_targets(dy, dx)]
                pref[:, c0:c0 + cl] = jnp.dot(
                    h, win[:, off:off + wd],
                    preferred_element_type=jnp.float32).astype(compute_dtype)

    # own interior rows into P3 (the DMA already landed them in fbuf)
    p3[:, :, 0:16 * C] = fbuf[slot]
    for dy in (-1, 0, 1):
        ci = 3 + (dy + 1)
        win = wins[ci][slot]
        for dx, off, wd in cw[ci][0]:
            if "ring0" in skip:
                continue
            h = hit(0, dy, dx)
            g = jnp.dot(h, win[:, off:off + wd],
                        preferred_element_type=jnp.float32
                        ).astype(compute_dtype)          # (128, tz*wd1)
            c0, cl = hc[_ring_targets(dy, dx)]
            wd1 = wd // tz
            for z in range(tz):
                p3[z, :, c0:c0 + cl] = g[:, z * wd1:(z + 1) * wd1]

    # ---- the conv: one matmul per z-plane + two z-side matmuls ----------
    if "main" in skip:
        u_sc[:] = jnp.zeros_like(u_sc)
    else:
        for z in range(tz):
            u_sc[z * BLK:(z + 1) * BLK, :] = jnp.dot(
                p3[z], wmain_ref[:], preferred_element_type=jnp.float32)
    if "zsides" in skip:
        zm_o = jnp.zeros((BLK, co16), jnp.float32)
        zp_o = zm_o
    else:
        zm_o = jnp.dot(pzm[:], mzm_ref[:],
                       preferred_element_type=jnp.float32)
        zp_o = jnp.dot(pzp[:], mzp_ref[:],
                       preferred_element_type=jnp.float32)

    # ---- z combine + fused epilogue, one 128-row group per z -----------
    uu = u_sc
    for z in range(tz):
        lo = (zm_o if z == 0
              else uu[(z - 1) * BLK:z * BLK, 0:co16])
        mid = uu[z * BLK:(z + 1) * BLK, co16:2 * co16]
        hi = (zp_o if z == tz - 1
              else uu[(z + 1) * BLK:(z + 2) * BLK, 2 * co16:3 * co16])
        y = lo + mid + hi
        y = y * scale_ref[:] + shift_ref[:]
        if has_resid:
            y = y + resid_ref[z].astype(jnp.float32)
        if relu:
            y = jnp.maximum(y, 0.0)
        y = y * mask_ref[z].astype(jnp.float32)
        out_ref[z] = y.astype(out_ref.dtype)

    # ---- emit the next conv's export arrays from the finished block -----
    if "exports" in skip:
        for r in out_refs[1:]:
            r[:, 0:128] = out_ref[0][:, 0:128]
        return

    def cell(z, c4):  # (128, Co) output cell
        return out_ref[z][:, c4 * Co:(c4 + 1) * Co]

    def row4(z, cells):  # contiguous 4-cell row piece if possible
        c0 = cells[0]
        if cells == list(range(c0, c0 + 4)):
            return out_ref[z][:, c0 * Co:(c0 + 4) * Co]
        return None

    for ci in range(9):
        ref = out_refs[1 + ci]
        dz = ci // 3 - 1
        dy = ci % 3 - 1
        opieces, opad = cluster_pieces(Co, tz, ci)
        owidth = max(o + w for _, o, w in opieces)
        if opad > owidth:  # deterministic pad (never read by compute)
            ref[:, owidth:opad] = jnp.zeros((BLK, opad - owidth), ref.dtype)
        zs = range(tz) if dz == 0 else ((tz - 1,) if dz == -1 else (0,))
        for dx, off, wd in opieces:
            # what THIS tile exports for consumers in direction (dz,dy,dx):
            # the mirrored edge of its own block (consumer at +d reads our
            # hi edge, etc.)
            if dy == 0 and dx == 0 and dz != 0:
                cells = list(range(16))
            elif dy == 0 and dx != 0:
                xcol = 3 if dx == -1 else 0
                cells = [y4 * 4 + xcol for y4 in range(4)]
            elif dx == 0:
                yrow = 3 if dy == -1 else 0
                cells = list(range(yrow * 4, yrow * 4 + 4))
            else:
                yrow = 3 if dy == -1 else 0
                xcol = 3 if dx == -1 else 0
                cells = [yrow * 4 + xcol]
            wd1 = wd if dz != 0 else wd // tz
            for z in zs:
                base = off + (z * wd1 if dz == 0 else 0)
                r4 = row4(z, cells) if len(cells) == 4 else None
                if r4 is not None:
                    ref[:, base:base + wd1] = r4
                elif len(cells) == 16:
                    ref[:, base:base + wd1] = out_ref[z]
                else:
                    for k, c4 in enumerate(cells):
                        ref[:, base + k * Co:base + (k + 1) * Co] = \
                            cell(z, c4)


def tile_subm_pallas(state, exports, plan_ws, plan_tgt, wmain, mzm, mzp,
                     scale16, shift16, mask16, residual=None, *, relu=True,
                     W0=192, WZ=256, interpret=None, skip=()):
    """One fused submanifold conv + epilogue + export emission.

    state (tz, T1p, 16C) z-major plane rows; exports: 9-tuple of cluster
    export arrays (see cluster_pieces; built by ops/tile_kernel.make_exports
    or the previous conv's kernel); plan_ws (nb, 9) int32 window starts /
    GRAN; plan_tgt (nb, 32, 128) int32 neighbor ranks (SENTINEL = absent/
    out-of-window); wmain (36C, 3*16Co), mzm/mzp (36C, 16Co); scale16/
    shift16 (1, 16Co); mask16/residual (tz, T1p, 16Co). W0/WZ: rank-window
    tiles for same-layer / z-side clusters. Returns (out, 9 exports)."""
    if interpret is None:  # Mosaic on TPU; interpreter on CPU (tests)
        interpret = jax.default_backend() == "cpu"
    tz, t1p, c16 = state.shape
    C = c16 // 16
    co16 = wmain.shape[1] // 3
    Co = co16 // 16
    nb = t1p // BLK
    assert t1p % BLK == 0, t1p
    wcap = (t1p // GRAN) * GRAN
    Ws = tuple((min(W0, wcap) if ci // 3 == 1 else min(WZ, wcap))
               for ci in range(9))
    dt = state.dtype
    eye = jnp.eye(BLK, dtype=jnp.float32)
    widths = cluster_widths(C, tz)
    owidths = cluster_widths(Co, tz)

    out_shapes = tuple(
        [jax.ShapeDtypeStruct((tz, t1p, co16), dt)]
        + [jax.ShapeDtypeStruct((t1p, w), dt) for w in owidths])
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),   # ws flat (nb*9,)
        pl.BlockSpec((1, 32, BLK), lambda i: (i, 0, 0)),   # targets
        pl.BlockSpec(memory_space=pltpu.VMEM),   # eye
        pl.BlockSpec(memory_space=pl.ANY),       # state (manual DMA)
    ] + [pl.BlockSpec(memory_space=pl.ANY)] * 9 + [
        pl.BlockSpec(memory_space=pltpu.VMEM),   # wmain
        pl.BlockSpec(memory_space=pltpu.VMEM),   # mzm
        pl.BlockSpec(memory_space=pltpu.VMEM),   # mzp
        pl.BlockSpec(memory_space=pltpu.VMEM),   # scale (1, 16Co)
        pl.BlockSpec(memory_space=pltpu.VMEM),   # shift
        pl.BlockSpec((tz, BLK, co16), lambda i: (0, i, 0)),  # mask
    ]
    args = [plan_ws.reshape(-1), plan_tgt, eye, state, *exports,
            wmain.astype(dt), mzm.astype(dt), mzp.astype(dt),
            scale16.astype(jnp.float32), shift16.astype(jnp.float32),
            mask16]
    if residual is not None:
        in_specs.append(pl.BlockSpec((tz, BLK, co16), lambda i: (0, i, 0)))
        args.append(residual)

    call = pl.pallas_call(
        partial(_tile_kernel, tz=tz, C=C, Co=Co, Ws=Ws, T1p=t1p,
                relu=relu, has_resid=residual is not None,
                compute_dtype=dt, skip=tuple(skip)),
        out_shape=out_shapes,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=tuple(
            [pl.BlockSpec((tz, BLK, co16), lambda i: (0, i, 0))]
            + [pl.BlockSpec((BLK, w), lambda i: (i, 0)) for w in owidths]),
        scratch_shapes=[
            pltpu.VMEM((tz, BLK, 36 * C), dt),      # p3
            pltpu.VMEM((BLK, 36 * C), dt),          # pzm
            pltpu.VMEM((BLK, 36 * C), dt),          # pzp
            pltpu.VMEM((tz * BLK, 3 * co16), jnp.float32),  # u
            pltpu.VMEM((2, tz, BLK, 16 * C), dt),   # center double-buffer
        ] + [pltpu.VMEM((2, Ws[ci], widths[ci]), dt)
             for ci in range(9)] + [                # windows
            pltpu.SemaphoreType.DMA((20,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )
    outs = call(*args)
    return outs[0], tuple(outs[1:])
