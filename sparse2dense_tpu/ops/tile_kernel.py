"""Host/XLA side of the Pallas tile-block sparse conv engine ("tilek").

Builds everything ops/pallas/tile_block_kernel.py consumes:

- block plans: per-128-tile-block rank-window starts for the three DMA
  windows (dz = 0 / -1 / +1) plus the (nb, 32, 128) neighbor-rank target
  block, with out-of-window targets pre-counted (telemetry) and sentineled;
- halo-plane weight matrices: the 3x3 conv on a 36-cell halo plane as one
  (36C, 16Co) matmul matrix (build_whalo), and the z-packed main matrix
  (36C, 3*16Co);
- z-major tile state (tz, T1p, 16C) and its edge-export arrays
  (stage-initial; subsequent convs get exports straight from the kernel);
- the fused-epilogue vectors (BN fold + bias, tiled to the 16Co row
  layout).

Tile semantics (fixed z-chunks, lexicographic ranks, 26-direction exact
neighborhoods, counted budget overflow) are ops/tile_conv.py's; parity is
pinned against ops/tile_planes.subm_conv in tests/test_tile_kernel.py.
Replaces the spconv rulebook role of the reference backbone
(/root/reference/det3d/models/backbones/scn.py:89-185).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import tile_conv as TC
from .pallas.tile_block_kernel import (
    BLK, GRAN, SENTINEL, cluster_widths, dir_row, tile_subm_pallas,
)

TC_DIR_IDX = {d: i for i, d in enumerate(TC.DIRS)}


def t1p_of(budget: int) -> int:
    """Tile rows incl. phantom, padded to the 128-tile block size."""
    return -(-(budget + 1) // BLK) * BLK


# ---------------------------------------------------------------------------
# weight matrices
# ---------------------------------------------------------------------------

def _halo_cell_coords():
    """Plane coords (Y, X) in [0,6)^2 of the 36 halo-row cell groups, in
    the kernel's column order [interior 16 | xm 4 | xp 4 | ym 6 | yp 6]."""
    cells = [(y + 1, x + 1) for y in range(4) for x in range(4)]
    cells += [(y + 1, 0) for y in range(4)]
    cells += [(y + 1, 5) for y in range(4)]
    cells += [(0, x) for x in range(6)]
    cells += [(5, x) for x in range(6)]
    return cells


def build_whalo(wz: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, C, Co) single-z tap weights -> (36C, 16Co) halo-plane matmul
    matrix: out[(y*4+x)*Co+o] = sum_cells P[cell*C+c] * W[cell, c, y, x, o]."""
    c, co = wz.shape[2], wz.shape[3]
    gs, cl, aa, bb = [], [], [], []
    for g, (yy, xx) in enumerate(_halo_cell_coords()):
        for a in range(3):
            for b in range(3):
                y, x = yy - a, xx - b
                if 0 <= y < 4 and 0 <= x < 4:
                    gs.append(g)
                    cl.append(y * 4 + x)
                    aa.append(a)
                    bb.append(b)
    w = jnp.zeros((36, c, 16, co), wz.dtype)
    w = w.at[jnp.asarray(gs), :, jnp.asarray(cl), :].add(
        wz[jnp.asarray(aa), jnp.asarray(bb)])
    return w.reshape(36 * c, 16 * co)


def build_wmain(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """w (27, C, Co) z-major taps (checkpoint layout) -> (wmain (36C, 3*16Co),
    mzm (36C, 16Co), mzp (36C, 16Co))."""
    c, co = w.shape[1], w.shape[2]
    wk = w.reshape(3, 3, 3, c, co)
    parts = [build_whalo(wk[j]) for j in range(3)]
    return jnp.concatenate(parts, axis=1), parts[0], parts[2]


# ---------------------------------------------------------------------------
# block plan
# ---------------------------------------------------------------------------

class TKPlan(NamedTuple):
    ws: jnp.ndarray      # (nb, 9) int32 window starts / GRAN per cluster
    tgt: jnp.ndarray     # (nb, 32, 128) int32 neighbor ranks, SENTINEL pad
    n_miss: jnp.ndarray  # () int32 targets dropped for window overflow


def make_block_plan(ts: TC.TileSet, t1p: int, w0: int, wz: int,
                    rank_offset: int = 0) -> TKPlan:
    """Per-block DMA windows + targets for one batch element's tile set.

    One rank window per (dz, dy) BEV-row cluster (9): same-layer row
    clusters are near block-sized; z-side clusters absorb the layer
    density ratio. ``rank_offset`` shifts all ranks (batch-flattened
    layouts); windows are computed pre-offset so they never cross batch
    elements, then shifted.
    """
    budget = ts.tile_pos.shape[0]
    nb = t1p // BLK
    w0 = min(w0, (t1p // GRAN) * GRAN)
    wz = min(wz, (t1p // GRAN) * GRAN)

    # (27, T1p) targets indexed by dir_row (row 13 = self, unused)
    rows = [None] * 27
    for dz in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if (dz, dy, dx) == (0, 0, 0):
                    rows[13] = jnp.full((t1p,), SENTINEL, jnp.int32)
                    continue
                r = ts.nbr[:, TC_DIR_IDX[(dz, dy, dx)]]
                r = jnp.where(r < budget, r, SENTINEL)
                r = jnp.pad(r, (0, t1p - budget), constant_values=SENTINEL)
                rows[dir_row(dz, dy, dx)] = r
    tgt = jnp.stack(rows, 0)                                # (27, T1p)
    tgt = jnp.pad(tgt, ((0, 32 - 27), (0, 0)), constant_values=SENTINEL)
    tgt = tgt.reshape(32, nb, BLK).transpose(1, 0, 2)       # (nb, 32, 128)

    ws_cols, miss = [], jnp.int32(0)
    for ci in range(9):
        w = w0 if ci // 3 == 1 else wz
        g = tgt[:, 3 * ci:3 * ci + 3, :]
        lo = jnp.min(g.reshape(nb, -1), axis=1)             # SENTINEL if none
        ws = jnp.clip(lo, 0, max(t1p - w, 0))
        ws = (ws // GRAN) * GRAN
        inside = g < (ws[:, None, None] + w)
        miss = miss + jnp.sum(((g < SENTINEL) & ~inside).astype(jnp.int32))
        tgt = tgt.at[:, 3 * ci:3 * ci + 3, :].set(
            jnp.where(inside, g, SENTINEL))
        ws_cols.append(ws // GRAN)
    # rank_offset may be a traced per-element offset (batch flattening)
    tgt = jnp.where(tgt < SENTINEL, tgt + rank_offset, SENTINEL)
    ws_cols = [w + rank_offset // GRAN for w in ws_cols]
    return TKPlan(jnp.stack(ws_cols, -1).astype(jnp.int32),
                  tgt.astype(jnp.int32), miss)


def flatten_batch_plan(plans: TKPlan) -> TKPlan:
    """vmapped per-element plans (B, ...) -> one flat plan over B*T1p tiles.
    Callers must have built each element's plan with rank_offset=e*t1p
    (use make_block_plan_batched)."""
    b = plans.ws.shape[0]
    return TKPlan(plans.ws.reshape(-1, 9), plans.tgt.reshape(-1, 32, BLK),
                  jnp.sum(plans.n_miss))


def make_block_plan_batched(ts: TC.TileSet, t1p: int, w0: int,
                            wz: int) -> TKPlan:
    """ts with leading batch dim (B, ...) -> flat plan over (B*T1p) tiles."""
    b = ts.tile_pos.shape[0]
    offs = jnp.arange(b, dtype=jnp.int32) * t1p
    plans = jax.vmap(
        lambda t, o: make_block_plan(t, t1p, w0, wz, rank_offset=o)
    )(ts, offs)
    return flatten_batch_plan(plans)


# ---------------------------------------------------------------------------
# state / mask / exports
# ---------------------------------------------------------------------------

def build_state(feats: jnp.ndarray, coords: jnp.ndarray, ts: TC.TileSet,
                grid: Sequence[int], ty: int, tx: int, tz: int,
                t1p: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rows -> z-major tile state. feats (V, C) (already masked/cast),
    coords (V, 3) zyx. Returns (state (tz, T1p, 16C), mask (tz, T1p, 16))."""
    assert (ty, tx) == (4, 4), "tile kernel is specialized to 4x4 BEV tiles"
    nbz, nby, nbx = TC.tile_counts(grid, ty, tx, tz)
    budget = ts.tile_pos.shape[0]
    c = feats.shape[-1]
    z, y, x = coords[:, 0], coords[:, 1], coords[:, 2]
    valid = jnp.all(coords >= 0, axis=-1)
    key = ((z // tz) * nby + y // ty) * nbx + x // tx
    rank = ts.tmap[jnp.where(valid, key, nbz * nby * nbx)]
    in_set = valid & (rank < budget)
    zi, yi, xi = z - (z // tz) * tz, y - (y // ty) * ty, x - (x // tx) * tx
    cell = (zi * t1p + rank) * 16 + yi * 4 + xi
    nslot = tz * t1p * 16
    slot = jnp.where(in_set, cell, nslot).astype(jnp.int32)
    buf = jnp.zeros((nslot, c), feats.dtype).at[slot].add(feats, mode="drop")
    m = jnp.zeros((nslot, 1), feats.dtype).at[slot].max(
        jnp.ones((slot.shape[0], 1), feats.dtype), mode="drop")
    return (buf.reshape(tz, t1p, 16 * c),
            m.reshape(tz, t1p, 16))


def expand_mask(mask: jnp.ndarray, co: int) -> jnp.ndarray:
    """(tz, T1p, 16) occupancy -> (tz, T1p, 16*Co) per-lane mask (built once
    per stage; the kernel's epilogue multiplies rows by it)."""
    return jnp.repeat(mask, co, axis=-1)


def make_exports(state: jnp.ndarray, tz: int, c: int):
    """Per-cluster edge exports of a z-major state — the stage-initial
    build (later convs get exports straight from the kernel). Returns the
    9-tuple of (T1p, padded width) arrays in cluster order; the content a
    tile exports for cluster (dz, dy, dx) is its own edge FACING that
    consumer (mirror of the gather side, see
    tile_block_kernel.cluster_pieces)."""
    from .pallas.tile_block_kernel import cluster_pieces

    t1p = state.shape[1]
    sv = state.reshape(tz, t1p, 4, 4, c)

    def piece_z0(cells):  # z-major (T1p, tz*len(cells)*C)
        parts = [sv[:, :, c4 // 4, c4 % 4, :] for c4 in cells]
        a = jnp.stack(parts, axis=2)                 # (tz, T1p, k, C)
        return a.transpose(1, 0, 2, 3).reshape(t1p, -1)

    def piece_zs(z, cells):
        if len(cells) == 16:
            return sv[z].reshape(t1p, -1)
        parts = [sv[z, :, c4 // 4, c4 % 4, :] for c4 in cells]
        return jnp.concatenate(parts, axis=-1)

    def export_cells(dz, dy, dx):
        if dy == 0 and dx == 0 and dz != 0:
            return list(range(16))
        if dy == 0 and dx != 0:
            xcol = 3 if dx == -1 else 0
            return [y4 * 4 + xcol for y4 in range(4)]
        if dx == 0:
            yrow = 3 if dy == -1 else 0
            return list(range(yrow * 4, yrow * 4 + 4))
        yrow = 3 if dy == -1 else 0
        xcol = 3 if dx == -1 else 0
        return [yrow * 4 + xcol]

    out = []
    for ci in range(9):
        dz, dy = ci // 3 - 1, ci % 3 - 1
        pieces, width = cluster_pieces(c, tz, ci)
        cols = []
        for dx, off, wd in pieces:
            cells = export_cells(dz, dy, dx)
            if dz == 0:
                cols.append(piece_z0(cells))
            else:
                z = tz - 1 if dz == -1 else 0
                cols.append(piece_zs(z, cells))
        arr = jnp.concatenate(cols, axis=-1)
        arr = jnp.pad(arr, ((0, 0), (0, width - arr.shape[-1])))
        out.append(arr)
    return tuple(out)


def fold_epilogue(co: int, bias=None, bn_scale=None, bn_bias=None,
                  bn_mean=None, bn_var=None, eps: float = 1e-5):
    """Fold conv bias + (inference) BatchNorm into the kernel's per-row
    (1, 16Co) scale/shift vectors: y = x*scale + shift."""
    scale = jnp.ones((co,), jnp.float32)
    shift = jnp.zeros((co,), jnp.float32)
    if bias is not None:
        shift = shift + bias.astype(jnp.float32)
    if bn_scale is not None:
        s = bn_scale.astype(jnp.float32) * jax.lax.rsqrt(
            bn_var.astype(jnp.float32) + eps)
        shift = (shift - bn_mean.astype(jnp.float32)) * s + \
            bn_bias.astype(jnp.float32)
        scale = scale * s
    return (jnp.tile(scale, 16)[None, :], jnp.tile(shift, 16)[None, :])


# ---------------------------------------------------------------------------
# conv wrapper
# ---------------------------------------------------------------------------

def tk_subm_conv(state, exports, plan: TKPlan, w, scale16, shift16,
                 mask16, residual=None, *, relu=True, w0=192, wz=256,
                 interpret=None):
    """Fused subm conv + epilogue; returns (state', exports') with
    exports the 9-cluster tuple. w (27, Cin, Cout) z-major taps (the
    checkpoint layout)."""
    wmain, mzm, mzp = build_wmain(w)
    return tile_subm_pallas(
        state, exports, plan.ws, plan.tgt, wmain, mzm, mzp,
        scale16, shift16, mask16, residual,
        relu=relu, W0=w0, WZ=wz, interpret=interpret)


def build_state_batched(feats, coords, ts, grid, ty, tx, tz, t1p):
    """vmapped build_state, flattened to the kernel's batch-flat layout:
    (tz, B*T1p, 16C) state + (tz, B*T1p, 16) mask."""
    st, mk = jax.vmap(
        lambda f, c, t: build_state(f, c, t, grid, ty, tx, tz, t1p)
    )(feats, coords, ts)
    b = st.shape[0]
    st = st.transpose(1, 0, 2, 3).reshape(tz, b * t1p, st.shape[-1])
    mk = mk.transpose(1, 0, 2, 3).reshape(tz, b * t1p, 16)
    return st, mk


def state_to_planes_batched(state, b, t1p, tz, t1):
    """(tz, B*T1p, 16C) -> tile_planes batched interior rows
    (B, t1*tz, 4, 4, C) (t1 = tile budget + 1)."""
    c16 = state.shape[-1]
    st = state.reshape(tz, b, t1p, c16)[:, :, :t1]
    return st.transpose(1, 2, 0, 3).reshape(b, t1 * tz, 4, 4, c16 // 16)


def planes_to_state_batched(p, tz, t1p):
    """(B, N=t1*tz, ty, tx, C) -> (tz, B*T1p, 16C), tile rows padded."""
    b, n = p.shape[:2]
    c = p.shape[-1]
    t1 = n // tz
    st = p.reshape(b, t1, tz, 16 * c).transpose(2, 0, 1, 3)
    st = jnp.pad(st, ((0, 0), (0, 0), (0, t1p - t1), (0, 0)))
    return st.reshape(tz, b * t1p, 16 * c)


def state_to_planes(state: jnp.ndarray, tz: int, c: int) -> jnp.ndarray:
    """Z-major kernel state -> tile_planes interior rows (N, 4, 4, C) with
    N = T1p*tz (tile-major), for stage transitions and parity tests."""
    t1p = state.shape[1]
    return state.reshape(tz, t1p, 4, 4, c).transpose(1, 0, 2, 3, 4) \
        .reshape(t1p * tz, 4, 4, c)


def planes_to_state(p: jnp.ndarray, tz: int) -> jnp.ndarray:
    """tile_planes interior rows (N, 4, 4, C), N = T1*tz -> z-major state
    padded to (tz, T1p, 16C)."""
    n, ty, tx, c = p.shape
    t1 = n // tz
    t1p = t1p_of(t1 - 1)
    st = p.reshape(t1, tz, 16 * c).transpose(1, 0, 2)
    return jnp.pad(st, ((0, 0), (0, t1p - t1), (0, 0)))
