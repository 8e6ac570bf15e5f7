"""Pallas TPU kernel v4 for submanifold 3x3x3 conv: ACTIVE-PLANE rows in
(by, bx, z) rank order.

Second-generation fused sparse-conv kernel (supersedes
ops/pallas/tile_block_kernel.py's z-chunk formulation for the subm
stages). The unit of work is an ACTIVE z-plane of a 4x4 BEV tile — a
(by, bx, z) key with at least one voxel — instead of a full (tz-chunk,
by, bx) tile. Design history (measured on the round-4 synthetic Waymo
scene, real chip):

- PLANE-LEVEL SPARSITY (v3): the chunk kernel computes every z level of
  every active tile (conv1: 551k allocated planes for 116k active ->
  4.7x wasted MXU); here rows ARE active planes, nothing empty computes.
- ROW-MAJOR HALO MATMULS (v3): the 6x6 halo plane is stored row-major
  and the conv runs as one (128, in_rows*6C) @ (.., 4Co) matmul per
  output row(-pair): each output cell consumes 27 of the 54 fetched cell
  groups (50% MXU efficiency) vs 9 of 36 (25%) for the chunk kernel.
- (by, bx, z) RANK ORDER (v4): with z-major (z, by, bx) ranks, the
  dz = +-1 neighbor windows must absorb the z-layer density ratio
  (ground plane vs above is 10-30x) — measured misses never reached 0
  below W=512 (and 850 misses remained at conv2 even there), and W=512
  windows cost 4.3 ms/conv at conv3 scale. In (by, bx, z) order the
  z-neighbors of a plane are RANK-ADJACENT (same tile column) and the
  far direction is dy, whose span tracks the smooth BEV row occupancy:
  measured coverage is EXACT (0 misses) at W=128 at every stage.
- MERGED CLUSTERS + SHARED PIECES (v4): directions group by dy alone
  (3 clusters, 8-9 directions each, one two-range rank window per
  cluster), and directions that consume the same neighbor content
  (e.g. the x-lo column for dz = -1/0/+1) read the SAME export columns
  with different one-hot rows — export arrays shrink to 24C / 6C / 6C
  (vs 9 arrays totalling 104C in v3), cutting window DMA ~2.6x.

Everything else follows the chunk kernel's design: lexicographic plane
ranks give monotone per-cluster rank windows fetched as contiguous
rank-range DMAs from per-cluster export arrays; in-VMEM selection is a
one-hot MXU matmul; bias/BN/ReLU/mask (+residual) fuse into the
epilogue; the next conv's exports are emitted from the same VMEM block.
Every cluster gets TWO rank ranges (plan_ws[..., 0/1]): blocks
straddling a BEV tile-row boundary have bimodal neighbor-rank
distributions that a single window cannot cover.

Replaces the spconv rulebook+conv role of the reference backbone
(/root/reference/det3d/models/backbones/scn.py:89-185, spconv consumed
at :104-152).

Mosaic rules obeyed (learned rounds 2-4): DMA'd array widths padded to
128 lanes; no reshapes that regroup lanes; the (32, 128) target block is
MXU-transposed via an f32 identity matmul (exact: ranks < 2**24 and the
sentinel is a power of two); 32-bit matmul accumulation everywhere.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 128           # plane rows per grid step
SENTINEL = 2 ** 30  # target rank that never matches a window rank
GRAN = 16           # window-start granule (sublane rule)


def _pad128(w):
    return -(-w // 128) * 128


# ---------------------------------------------------------------------------
# export-array layouts: one array per dy consumer cluster (ci = dy + 1).
# Pieces are keyed by dx ONLY — every dz of a (dy, dx) direction reads the
# same columns (the content is the neighbor's (dy, dx)-facing edge, which
# does not depend on dz); only the one-hot row differs.
# ---------------------------------------------------------------------------

def cluster_pieces(C, ci):
    """[(dir_dx, piece_offset, piece_width)] + padded row width for the
    export array of cluster ci (dy = ci - 1)."""
    dy = ci - 1
    s16, s4, s1 = 16 * C, 4 * C, C
    if dy == 0:
        # dx=0 full plane (consumed by dz=+-1); x-edge cols for dx=-+1
        pieces = [(0, 0, s16), (-1, s16, s4), (1, s16 + s4, s4)]
        width = s16 + 2 * s4
    else:
        # facing y row for dx=0; corners for dx=-+1
        pieces = [(0, 0, s4), (-1, s4, s1), (1, s4 + s1, s1)]
        width = s4 + 2 * s1
    return pieces, _pad128(width)


def cluster_widths(C):
    return [cluster_pieces(C, ci)[1] for ci in range(3)]


# dir row index inside the plan's (nb, 32, 128) target block
def dir_row(dz, dy, dx):
    return ((dz + 1) * 3 + (dy + 1)) * 3 + (dx + 1)


# what a plane exports for consumers looking at it from offset (dy, dx):
# the mirrored facing edge of its own 4x4 cell block (dz-independent)
def export_cells(dy, dx):
    if dy == 0 and dx == 0:
        return list(range(16))
    if dy == 0:
        xcol = 3 if dx == -1 else 0
        return [y4 * 4 + xcol for y4 in range(4)]
    if dx == 0:
        yrow = 3 if dy == -1 else 0
        return list(range(yrow * 4, yrow * 4 + 4))
    yrow = 3 if dy == -1 else 0
    xcol = 3 if dx == -1 else 0
    return [yrow * 4 + xcol]


# ---------------------------------------------------------------------------
# h3 halo scratch layout: src-major [mid | zm | zp], each a row-major
# 6x6 halo plane; cell (r, cpos) of source s sits at (s*36 + r*6 + cpos)*C
# ---------------------------------------------------------------------------

def _h3_col(s, r, cpos, C):
    return (s * 36 + r * 6 + cpos) * C


def _src_of(dz):
    return 0 if dz == 0 else (1 if dz == -1 else 2)


def _plane_kernel(ws_ref, tgt_ref, eye_ref, cb_ref, *rest, C, Co, W0, WY,
                  T1p, relu, has_resid, rows_per_mm, compute_dtype,
                  skip=()):
    exp_hbm = rest[:3]
    rest = rest[3:]
    wmm_ref, scale_ref, shift_ref = rest[:3]
    rest = rest[3:]
    if has_resid:
        mask_ref, resid_ref = rest[:2]
        rest = rest[2:]
    else:
        mask_ref, resid_ref = rest[0], None
        rest = rest[1:]
    out_refs = rest[:4]            # out + 3 export outs
    scratch = rest[4:]
    h3 = scratch[0]
    wins = scratch[1:4]
    sems = scratch[4]
    out_ref = out_refs[0]
    i = pl.program_id(0)
    nb = pl.num_programs(0)
    cw = [cluster_pieces(C, ci) for ci in range(3)]
    Ws = [WY, W0, WY]

    # ---- double-buffered window DMAs: 3 clusters x 2 rank ranges --------
    def dmas(step, slot):
        ws = []
        cp = []
        for ci in range(3):
            W = Ws[ci]
            smax = (T1p - W) // GRAN
            s0 = jnp.minimum(ws_ref[(step * 3 + ci) * 2], smax) * GRAN
            s1 = jnp.minimum(ws_ref[(step * 3 + ci) * 2 + 1], smax) * GRAN
            ws.append((s0, s1))
            cp.append(pltpu.make_async_copy(
                exp_hbm[ci].at[pl.ds(s0, W), :],
                wins[ci].at[slot, pl.ds(0, W), :],
                sems.at[slot * 6 + 2 * ci]))
            cp.append(pltpu.make_async_copy(
                exp_hbm[ci].at[pl.ds(s1, W), :],
                wins[ci].at[slot, pl.ds(W, W), :],
                sems.at[slot * 6 + 2 * ci + 1]))
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

    # ---- per-row neighbor ranks, MXU-transposed to (128, 32) -----------
    tgtf = tgt_ref[0].astype(jnp.float32)                # (32, 128)
    dn = (((1,), (1,)), ((), ()))
    tgtT = jax.lax.dot_general(eye_ref[:], tgtf, dn,
                               preferred_element_type=jnp.float32)
    tgtT = tgtT.astype(jnp.int32)                        # (128, 32)

    def hit(dz, dy, dx):
        ci = dy + 1
        W = Ws[ci]
        s0, s1 = ws[ci]
        it = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
        r0 = s0 + it
        r1 = s1 + it
        # range 1 may overlap range 0 after granule flooring; mask the
        # overlap so a target never one-hots twice
        r1 = jnp.where(r1 >= s0 + W, r1, -1)
        ranks = jnp.concatenate([r0, r1], axis=1)        # (1, 2W)
        t = tgtT[:, dir_row(dz, dy, dx):dir_row(dz, dy, dx) + 1]
        return (t == ranks).astype(compute_dtype)        # (128, 2W)

    # ---- assemble the three row-major halo planes -----------------------
    # own interior cells (arrive via the center BlockSpec)
    cb = cb_ref[...]
    for y in range(4):
        h3[:, _h3_col(0, y + 1, 1, C):_h3_col(0, y + 1, 1, C) + 4 * C] = \
            cb[:, y * 4 * C:(y + 1) * 4 * C]

    for dy in (-1, 0, 1):
        ci = dy + 1
        if "gathers" in skip:
            continue
        win = wins[ci][slot]
        for dx, off, wd in cw[ci][0]:
            for dz in (-1, 0, 1):
                if (dz, dy, dx) == (0, 0, 0):
                    continue
                s = _src_of(dz)
                h = hit(dz, dy, dx)
                g = jnp.dot(h, win[:, off:off + wd],
                            preferred_element_type=jnp.float32
                            ).astype(compute_dtype)      # (128, wd)
                if dy == 0 and dx == 0:                  # full plane
                    for y in range(4):
                        c0 = _h3_col(s, y + 1, 1, C)
                        h3[:, c0:c0 + 4 * C] = g[:, y * 4 * C:(y + 1) * 4 * C]
                elif dy == 0:                            # x column piece
                    cpos = 0 if dx == -1 else 5
                    for y in range(4):
                        c0 = _h3_col(s, y + 1, cpos, C)
                        h3[:, c0:c0 + C] = g[:, y * C:(y + 1) * C]
                elif dx == 0:                            # y row piece
                    r = 0 if dy == -1 else 5
                    c0 = _h3_col(s, r, 1, C)
                    h3[:, c0:c0 + 4 * C] = g
                else:                                    # corner
                    r = 0 if dy == -1 else 5
                    cpos = 0 if dx == -1 else 5
                    c0 = _h3_col(s, r, cpos, C)
                    h3[:, c0:c0 + C] = g

    # ---- the conv: one matmul per (source, output-row[-pair]) ----------
    # + fused epilogue per output row group
    n_groups = 4 // rows_per_mm
    in_rows = 2 + rows_per_mm                            # halo rows used
    for gidx in range(n_groups):
        y0 = gidx * rows_per_mm
        acc = None
        for s in range(3):
            if "main" in skip:
                continue
            c0 = _h3_col(s, y0, 0, C)
            seg = h3[:, c0:c0 + in_rows * 6 * C]
            u = jnp.dot(seg, wmm_ref[s * n_groups + gidx],
                        preferred_element_type=jnp.float32)
            acc = u if acc is None else acc + u
        if acc is None:
            acc = jnp.zeros((BLK, rows_per_mm * 4 * Co), jnp.float32)
        o0 = y0 * 4 * Co
        ow = rows_per_mm * 4 * Co
        y = acc * scale_ref[:, o0:o0 + ow] + shift_ref[:, o0:o0 + ow]
        if has_resid:
            y = y + resid_ref[:, o0:o0 + ow].astype(jnp.float32)
        if relu:
            y = jnp.maximum(y, 0.0)
        y = y * mask_ref[:, o0:o0 + ow].astype(jnp.float32)
        out_ref[:, o0:o0 + ow] = y.astype(out_ref.dtype)

    # ---- emit the next conv's export arrays from the finished block -----
    if "exports" in skip:
        for r in out_refs[1:]:
            r[:, 0:128] = out_ref[:, 0:128]
        return

    for ci in range(3):
        ref = out_refs[1 + ci]
        dy = ci - 1
        opieces, opad = cluster_pieces(Co, ci)
        for dx, off, wd in opieces:
            cells = export_cells(dy, dx)
            if len(cells) == 16:
                ref[:, off:off + wd] = out_ref[...]
            elif cells == list(range(cells[0], cells[0] + 4)):
                c0 = cells[0] * Co
                ref[:, off:off + wd] = out_ref[:, c0:c0 + 4 * Co]
            else:
                for k, c4 in enumerate(cells):
                    ref[:, off + k * Co:off + (k + 1) * Co] = \
                        out_ref[:, c4 * Co:(c4 + 1) * Co]
        owidth = max(o + w for _, o, w in opieces)
        if opad > owidth:  # deterministic pad (never read by compute)
            ref[:, owidth:opad] = jnp.zeros((BLK, opad - owidth), ref.dtype)


def plane_subm_pallas(state, exports, plan_ws, plan_tgt, wmm, scale16,
                      shift16, mask16, residual=None, *, relu=True,
                      W0=128, WY=128, interpret=None, skip=()):
    """One fused plane-level submanifold conv + epilogue + exports.

    state (T1p, 16C) plane rows (lexicographic (by, bx, z) ranks);
    exports: 3-tuple of cluster export arrays (make_plane_exports or the
    previous conv's kernel); plan_ws (nb, 3, 2) int32 window starts /
    GRAN (two rank ranges per cluster); plan_tgt (nb, 32, 128) int32
    neighbor ranks (SENTINEL = absent / out-of-window, pre-counted);
    wmm (3*n_groups, in_rows*6C, rows_per_mm*4Co) per-(source, row-group)
    conv matrices (ops/plane_conv.build_wrows); scale16/shift16 (1, 16Co)
    f32; mask16/residual (T1p, 16Co). W0/WY: per-range window rows for
    the dy=0 / dy=+-1 clusters. Returns (out (T1p, 16Co), exports')."""
    if interpret is None:  # Mosaic on TPU; interpreter on CPU (tests)
        interpret = jax.default_backend() == "cpu"
    t1p, c16 = state.shape
    C = c16 // 16
    nb = t1p // BLK
    assert t1p % BLK == 0, t1p
    n_src_groups, in_cols, out_cols = wmm.shape
    n_groups = n_src_groups // 3
    rows_per_mm = 4 // n_groups
    Co = out_cols // (rows_per_mm * 4)
    co16 = 16 * Co
    wcap = (t1p // GRAN) * GRAN
    # keep in sync with plane_conv.make_plane_plan's rounding: windows are
    # GRAN multiples so window starts clip exactly (no stranded tail ranks)
    W0 = min(-(-W0 // GRAN) * GRAN, wcap)
    WY = min(-(-WY // GRAN) * GRAN, wcap)
    dt = state.dtype
    eye = jnp.eye(BLK, dtype=jnp.float32)
    widths = cluster_widths(C)
    owidths = cluster_widths(Co)

    out_shapes = tuple(
        [jax.ShapeDtypeStruct((t1p, co16), dt)]
        + [jax.ShapeDtypeStruct((t1p, w), dt) for w in owidths])
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),   # ws flat (nb*6,)
        pl.BlockSpec((1, 32, BLK), lambda i: (i, 0, 0)),   # targets
        pl.BlockSpec(memory_space=pltpu.VMEM),   # eye
        pl.BlockSpec((BLK, c16), lambda i: (i, 0)),        # center rows
    ] + [pl.BlockSpec(memory_space=pl.ANY)] * 3 + [
        pl.BlockSpec(memory_space=pltpu.VMEM),   # wmm
        pl.BlockSpec(memory_space=pltpu.VMEM),   # scale (1, 16Co)
        pl.BlockSpec(memory_space=pltpu.VMEM),   # shift
        pl.BlockSpec((BLK, co16), lambda i: (i, 0)),       # mask
    ]
    args = [plan_ws.reshape(-1), plan_tgt, eye, state, *exports,
            wmm.astype(dt), scale16.astype(jnp.float32),
            shift16.astype(jnp.float32), mask16]
    if residual is not None:
        in_specs.append(pl.BlockSpec((BLK, co16), lambda i: (i, 0)))
        args.append(residual)

    call = pl.pallas_call(
        partial(_plane_kernel, C=C, Co=Co, W0=W0, WY=WY, T1p=t1p,
                relu=relu, has_resid=residual is not None,
                rows_per_mm=rows_per_mm, compute_dtype=dt,
                skip=tuple(skip)),
        out_shape=out_shapes,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=tuple(
            [pl.BlockSpec((BLK, co16), lambda i: (i, 0))]
            + [pl.BlockSpec((BLK, w), lambda i: (i, 0)) for w in owidths]),
        scratch_shapes=[
            pltpu.VMEM((BLK, 108 * C), dt),        # h3
        ] + [pltpu.VMEM((2, 2 * (W0 if ci == 1 else WY), widths[ci]),
                        dt) for ci in range(3)] + [
            pltpu.SemaphoreType.DMA((12,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )
    outs = call(*args)
    return outs[0], tuple(outs[1:])
