"""Planes-layout z-chunked BEV-tile engine: the fast TPU tile backend.

Same tile semantics as ops/tile_conv.py (fixed z-chunks, 26-direction
halo, exact strided downsample — that module stays as the small-scale
oracle these kernels are tested against), but laid out and scheduled for
the real chip:

- persistent state is PLANES (N, ty+2, tx+2, C) with N = (T+1)*(tz+2):
  each tile contributes tz+2 plane rows (its z-halo rows inline). XLA's
  conv path consumes plane args directly; the 5D halo-padded layout of
  tile_conv.py forces a (16,128)-tiled relayout at the reshape->conv
  edge that pads a conv1-scale buffer 21x (measured 11.45 GB temp, OOM).
- halo refresh gathers neighbor content with WINDOWED ONE-HOT MXU
  contractions (ops/onehot_gather.py), not XLA row-gathers: tile ranks
  are lexicographic in (bz, by, bx), so every neighbor-rank map is
  monotone with bounded per-block spread; XLA's native gather moves
  ~0.14-0.5 Mrows/ms (measured) and would cost more than the convs.
  Misses are patched exactly and counted (telemetry).
- submanifold conv: z-packed (Cout' = 3*Cout) VALID 2D conv over all
  plane rows + flat z-shifted adds; a tile's z-shifts never cross into
  another tile's rows because the z-halo rows sit inline.
- everything is differentiable XLA (one-hot contractions transpose
  cleanly); training needs no custom_vjp.

Matches the spconv role of reference det3d/models/backbones/scn.py:89-185.
Parity: tests/test_tile_planes.py pins every op against ops/tile_conv.py
(itself pinned to the gather-GEMM/dense oracle), including gradients.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .onehot_gather import onehot_gather_exact
from . import tile_conv as TC

DIR_IDX = {d: i for i, d in enumerate(TC.DIRS)}


def _nbr(ts: TC.TileSet, d: Tuple[int, int, int]) -> jnp.ndarray:
    """(T,) neighbor rank for direction d=(dz,dy,dx); -1 when absent (so
    onehot_gather returns zeros without widening any window)."""
    budget = ts.tile_pos.shape[0]
    r = ts.nbr[:, DIR_IDX[d]]
    return jnp.where(r < budget, r, -1).astype(jnp.int32)


def _pad_phantom(x: jnp.ndarray) -> jnp.ndarray:
    """(T, ...) -> (T+1, ...) with a zero phantom row at rank T."""
    return jnp.pad(x, ((0, 1),) + ((0, 0),) * (x.ndim - 1))


class Halo(NamedTuple):
    """Per-batch-element refresh telemetry."""

    n_miss: jnp.ndarray  # () int32 one-hot window misses (exact-patched)


def scatter_rows(feats: jnp.ndarray, row_slot: jnp.ndarray, ts: TC.TileSet,
                 tz: int, ty: int, tx: int) -> jnp.ndarray:
    """(V, C) rows -> plane rows (N, ty+2, tx+2, C), halos refreshed.

    row_slot comes from tile_conv.build_tile_set / row_slots (flat index
    into the (T+1, tz+2, ty+2, tx+2) halo-padded space)."""
    t1 = ts.tile_pos.shape[0] + 1
    c = feats.shape[-1]
    nslot = t1 * (tz + 2) * (ty + 2) * (tx + 2)
    buf = jnp.zeros((nslot, c), feats.dtype).at[row_slot].add(
        feats, mode="drop")
    y = buf.reshape(t1 * (tz + 2), ty + 2, tx + 2, c)[:, 1:ty + 1, 1:tx + 1]
    p, _ = refresh(y, ts, tz)
    return p


def build_mask(row_slot: jnp.ndarray, ts: TC.TileSet, tz: int, ty: int,
               tx: int) -> jnp.ndarray:
    """Interior active mask in plane rows: (N, ty, tx, 1), zero at z-halo
    plane rows."""
    t1 = ts.tile_pos.shape[0] + 1
    nslot = t1 * (tz + 2) * (ty + 2) * (tx + 2)
    m = jnp.zeros((nslot, 1), jnp.float32).at[row_slot].max(
        jnp.ones((row_slot.shape[0], 1), jnp.float32), mode="drop")
    return m.reshape(t1 * (tz + 2), ty + 2, tx + 2, 1)[:, 1:ty + 1, 1:tx + 1]


def _exports(y6: jnp.ndarray):
    """Folded 2D boundary exports of interior content.

    y6 (T1, tzp, ty, tx, C) plane rows per tile (z-halo rows included but
    not exported). Returns a dict of (T1, D) arrays."""
    t1, tzp, ty, tx, c = y6.shape
    tz = tzp - 2
    s = y6[:, 1:tz + 1]                                     # interior z
    e = {
        "xlo": s[:, :, :, 0, :], "xhi": s[:, :, :, tx - 1, :],
        "ylo": s[:, :, 0, :, :], "yhi": s[:, :, ty - 1, :, :],
        "c00": s[:, :, 0, 0, :], "c0x": s[:, :, 0, tx - 1, :],
        "cx0": s[:, :, ty - 1, 0, :], "cxx": s[:, :, ty - 1, tx - 1, :],
        "zt": s[:, tz - 1], "zb": s[:, 0],
    }
    for tag in ("zt", "zb"):
        p = e[tag]                                          # (T1, ty, tx, C)
        e[tag + "_xlo"] = p[:, :, 0, :]
        e[tag + "_xhi"] = p[:, :, tx - 1, :]
        e[tag + "_ylo"] = p[:, 0, :, :]
        e[tag + "_yhi"] = p[:, ty - 1, :, :]
        e[tag + "_c00"] = p[:, 0, 0, :]
        e[tag + "_c0x"] = p[:, 0, tx - 1, :]
        e[tag + "_cx0"] = p[:, ty - 1, 0, :]
        e[tag + "_cxx"] = p[:, ty - 1, tx - 1, :]
    return {k: v.reshape(t1, -1) for k, v in e.items()}


def _og(table, idx, window):
    # pad the index stream to a 128 multiple (gather blocks); contract in
    # the table's own dtype so an f32 state stays bit-exact (production
    # states are bf16, where the one-hot matmul is exact anyway: gathered
    # rows are sums of a single product by 1.0)
    m = idx.shape[0]
    mp = -(-m // 128) * 128
    idxp = jnp.pad(idx, (0, mp - m), constant_values=-1)
    out, nmiss = onehot_gather_exact(table, idxp, window,
                                     compute_dtype=table.dtype)
    return out[:m], nmiss


def _assemble_plane(core, xlo, xhi, ylo, yhi, cmm, cmp_, cpm, cpp,
                    t1, nz, ty, tx, c):
    """Concat a (t1, nz, ty, tx, C) core with its 4 edge strips and 4
    corner columns into (t1, nz, ty+2, tx+2, C)."""
    mid = jnp.concatenate([xlo.reshape(t1, nz, ty, 1, c), core,
                           xhi.reshape(t1, nz, ty, 1, c)], axis=3)
    top = jnp.concatenate([cmm.reshape(t1, nz, 1, 1, c),
                           ylo.reshape(t1, nz, 1, tx, c),
                           cmp_.reshape(t1, nz, 1, 1, c)], axis=3)
    bot = jnp.concatenate([cpm.reshape(t1, nz, 1, 1, c),
                           yhi.reshape(t1, nz, 1, tx, c),
                           cpp.reshape(t1, nz, 1, 1, c)], axis=3)
    return jnp.concatenate([top, mid, bot], axis=2)


def refresh(y: jnp.ndarray, ts: TC.TileSet, tz: int,
            window: int = 256) -> Tuple[jnp.ndarray, Halo]:
    """Interior plane rows (N, ty, tx, C) -> halo-complete planes
    (N, ty+2, tx+2, C) via 26 one-hot export gathers."""
    n, ty, tx, c = y.shape
    tzp = tz + 2
    t1 = n // tzp
    y6 = y.reshape(t1, tzp, ty, tx, c)
    e = _exports(y6)
    miss = jnp.int32(0)

    def g(tag, d):
        nonlocal miss
        out, nm = _og(e[tag], _nbr(ts, d), window)
        miss = miss + nm
        return _pad_phantom(out)   # (T,) gathers -> T1 rows (zero phantom)

    # interior planes: xy faces + corners from same-z-chunk neighbors
    mid = _assemble_plane(
        y6[:, 1:tz + 1],
        g("xhi", (0, 0, -1)), g("xlo", (0, 0, 1)),
        g("yhi", (0, -1, 0)), g("ylo", (0, 1, 0)),
        g("cxx", (0, -1, -1)), g("cx0", (0, -1, 1)),
        g("c0x", (0, 1, -1)), g("c00", (0, 1, 1)),
        t1, tz, ty, tx, c)

    # z-halo planes: full plane + edges + corners from z-side neighbors
    zlo = _assemble_plane(
        g("zt", (-1, 0, 0)).reshape(t1, 1, ty, tx, c),
        g("zt_xhi", (-1, 0, -1)), g("zt_xlo", (-1, 0, 1)),
        g("zt_yhi", (-1, -1, 0)), g("zt_ylo", (-1, 1, 0)),
        g("zt_cxx", (-1, -1, -1)), g("zt_cx0", (-1, -1, 1)),
        g("zt_c0x", (-1, 1, -1)), g("zt_c00", (-1, 1, 1)),
        t1, 1, ty, tx, c)
    zhi = _assemble_plane(
        g("zb", (1, 0, 0)).reshape(t1, 1, ty, tx, c),
        g("zb_xhi", (1, 0, -1)), g("zb_xlo", (1, 0, 1)),
        g("zb_yhi", (1, -1, 0)), g("zb_ylo", (1, 1, 0)),
        g("zb_cxx", (1, -1, -1)), g("zb_cx0", (1, -1, 1)),
        g("zb_c0x", (1, 1, -1)), g("zb_c00", (1, 1, 1)),
        t1, 1, ty, tx, c)

    p = jnp.concatenate([zlo, mid, zhi], axis=1)   # (T1, tzp, typ, txp, C)
    p = p.reshape(n, ty + 2, tx + 2, c)
    # phantom tile rows stay zero: gathers from absent ranks return zero,
    # but the phantom's own y rows might be nonzero garbage — they are
    # zero by construction (mask-zeroed conv outputs / zero scatter).
    return p, Halo(miss)


def subm_conv(p: jnp.ndarray, mask: jnp.ndarray, w: jnp.ndarray,
              bias: Optional[jnp.ndarray] = None,
              compute_dtype=None) -> jnp.ndarray:
    """Submanifold 3x3x3 conv on halo-complete planes.

    p (N, ty+2, tx+2, Cin); mask (N, ty, tx, 1). w (27, Cin, Cout) z-major
    taps (the checkpoint layout). Returns interior plane rows
    (N, ty, tx, Cout), masked (z-halo rows zero). Caller re-refreshes.
    """
    n, typ_, txp, cin = p.shape
    ty, tx = typ_ - 2, txp - 2
    cout = w.shape[-1]
    wk = w.reshape(3, 3, 3, cin, cout)
    x = p
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        wk = wk.astype(compute_dtype)
    wcat = jnp.concatenate([wk[0], wk[1], wk[2]], axis=-1)  # (3,3,Cin,3Co)
    u = jax.lax.conv_general_dilated(
        x, wcat, (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)                 # (N, ty, tx, 3Co)
    core = (u[0:n - 2, :, :, 0:cout] + u[1:n - 1, :, :, cout:2 * cout]
            + u[2:n, :, :, 2 * cout:3 * cout])
    y = jnp.pad(core, ((1, 1), (0, 0), (0, 0), (0, 0))).astype(p.dtype)
    if bias is not None:
        y = y + bias
    return y * mask.astype(y.dtype)


def zconv(y: jnp.ndarray, mask: jnp.ndarray, w: jnp.ndarray, d: int, tz: int,
          compute_dtype=None):
    """extra_conv: (3,1,1) stride (2,1,1) padding 0, single z-chunk
    (tz >= d). y (N, ty, tx, C) interior plane rows. Returns
    (out (T1, d2, ty, tx, Cout), mask_out)."""
    n, ty, tx, cin = y.shape
    tzp = tz + 2
    t1 = n // tzp
    assert tz >= d
    d2 = (d - 3) // 2 + 1
    wk = w.reshape(3, cin, -1)
    x6 = y.reshape(t1, tzp, ty, tx, cin)
    m6 = mask.reshape(t1, tzp, ty, tx, 1)
    if compute_dtype is not None:
        x6 = x6.astype(compute_dtype)
        wk = wk.astype(compute_dtype)
    out = None
    for iz in range(3):
        # abs in z = 2*k + iz -> plane row = that + 1 (z0 == 0)
        zsl = jax.lax.slice_in_dim(x6, 1 + iz, 1 + iz + 2 * (d2 - 1) + 1, 2,
                                   axis=1)
        o = jnp.einsum("tzyxc,cd->tzyxd", zsl, wk[iz],
                       preferred_element_type=jnp.float32)
        out = o if out is None else out + o
    out = out.astype(y.dtype)
    m = jax.lax.reduce_window(
        m6[:, 1:d + 1], -jnp.inf, jax.lax.max, (1, 3, 1, 1, 1),
        (1, 2, 1, 1, 1),
        [(0, 0), (0, 0), (0, 0), (0, 0), (0, 0)])
    m = (m > 0).astype(mask.dtype)
    return out * m.astype(out.dtype), m


def downsample(y: jnp.ndarray, mask: jnp.ndarray, ts: TC.TileSet,
               grid: Sequence[int], w: jnp.ndarray,
               ksize: Tuple[int, int, int], padding: Tuple[int, int, int],
               tz: int, tz_out: int, budget_out: int,
               compute_dtype=None, window: int = 256):
    """Strided (2,2,2) conv, planes layout; same semantics/constraints as
    tile_conv.tile_downsample (2*tz_out == tz or single output chunk).

    y (N, ty, tx, C) interior plane rows (halo state NOT required — the
    patch reads interiors only). Returns (y_out (N_out, ty, tx, Cout),
    mask_out, ts_out, grid_out, n_miss)."""
    d, h, w_g = grid
    n, ty, tx, cin = y.shape
    tzp = tz + 2
    t1 = n // tzp
    kz, ky, kx = ksize
    pz = padding[0]
    assert (ky, kx) == (3, 3) and padding[1] == 1 and padding[2] == 1
    nbz, nby, nbx = TC.tile_counts(grid, ty, tx, tz)
    d_out = (d + 2 * pz - kz) // 2 + 1
    grid_out = (d_out, (h + 2 - 3) // 2 + 1, (w_g + 2 - 3) // 2 + 1)
    nbzo, nbyo, nbxo = TC.tile_counts(grid_out, ty, tx, tz_out)
    assert 2 * tz_out == tz or nbzo == 1

    # ---- output tile set (identical math to tile_conv) -----------------
    zlo_in = ts.tile_pos[:, 0] * tz
    zplo = jnp.clip(-(-(zlo_in + pz - kz + 1) // 2), 0, d_out - 1)
    zphi = jnp.clip((zlo_in + tz - 1 + pz) // 2, 0, d_out - 1)
    byo, bxo = ts.tile_pos[:, 1] // 2, ts.tile_pos[:, 2] // 2
    cand = []
    for zp_ in (zplo, zphi):
        k_ = ((zp_ // tz_out) * nbyo + byo) * nbxo + bxo
        cand.append(jnp.where(ts.valid, k_, TC.BIG))
    tid, tvalid, tmap_out, n_out = TC._compact_keys(
        jnp.concatenate(cand), budget_out, nbzo * nbyo * nbxo)
    t = jnp.maximum(tid, 0)
    tpos = jnp.where(
        tvalid[:, None],
        jnp.stack([t // (nbyo * nbxo), (t // nbxo) % nbyo, t % nbxo], -1),
        -1).astype(jnp.int32)

    pzn = 2 * tz_out + kz - 2
    zgroups = TC._z_sources(pzn, pz, tz)
    bz_src = tpos[:, 0] if 2 * tz_out == tz else jnp.zeros_like(tpos[:, 0])

    def src_rank(s, a, b):
        sy = tpos[:, 1] * 2 - 1 + a
        sx = tpos[:, 2] * 2 - 1 + b
        sz = bz_src + s
        ok = (tvalid & (sz >= 0) & (sz < nbz) & (sy >= 0) & (sy < nby)
              & (sx >= 0) & (sx < nbx))
        key = jnp.where(ok, (sz * nby + sy) * nbx + sx, nbz * nby * nbx)
        r = jnp.where(ok, ts.tmap[key], t1 - 1)
        return jnp.where(r < t1 - 1, r, -1).astype(jnp.int32)

    # folded full-z exports of the input content (interior rows)
    y6 = y.reshape(t1, tzp, ty, tx, cin)
    s6 = y6[:, 1:tz + 1]
    m6 = mask.reshape(t1, tzp, ty, tx, 1)[:, 1:tz + 1]
    exp = {
        "core": s6.reshape(t1, -1),
        "xlo": s6[:, :, :, 0, :].reshape(t1, -1),
        "xhi": s6[:, :, :, tx - 1, :].reshape(t1, -1),
        "ylo": s6[:, :, 0, :, :].reshape(t1, -1),
        "yhi": s6[:, :, ty - 1, :, :].reshape(t1, -1),
        "c00": s6[:, :, 0, 0, :].reshape(t1, -1),
        "c0x": s6[:, :, 0, tx - 1, :].reshape(t1, -1),
        "cx0": s6[:, :, ty - 1, 0, :].reshape(t1, -1),
        "cxx": s6[:, :, ty - 1, tx - 1, :].reshape(t1, -1),
    }
    mexp = {
        "core": m6.reshape(t1, -1),
        "xlo": m6[:, :, :, 0, :].reshape(t1, -1),
        "xhi": m6[:, :, :, tx - 1, :].reshape(t1, -1),
        "ylo": m6[:, :, 0, :, :].reshape(t1, -1),
        "yhi": m6[:, :, ty - 1, :, :].reshape(t1, -1),
        "c00": m6[:, :, 0, 0, :].reshape(t1, -1),
        "c0x": m6[:, :, 0, tx - 1, :].reshape(t1, -1),
        "cx0": m6[:, :, ty - 1, 0, :].reshape(t1, -1),
        "cxx": m6[:, :, ty - 1, tx - 1, :].reshape(t1, -1),
    }
    # piece tag by lattice position (a: y, b: x): which export supplies it
    def tag_of(a, b):
        ia = 0 if a == 0 else (2 if a == 3 else 1)
        ib = 0 if b == 0 else (2 if b == 3 else 1)
        return [["cxx", "yhi", "cx0"],
                ["xhi", "core", "xlo"],
                ["c0x", "ylo", "c00"]][ia][ib]

    shp_of = {
        "core": (tz, ty, tx), "xlo": (tz, ty, 1), "xhi": (tz, ty, 1),
        "ylo": (tz, 1, tx), "yhi": (tz, 1, tx),
        "c00": (tz, 1, 1), "c0x": (tz, 1, 1),
        "cx0": (tz, 1, 1), "cxx": (tz, 1, 1),
    }

    miss = jnp.int32(0)

    def assemble(src_exp, c):
        nonlocal miss
        bands = []
        for a in range(4):
            row = []
            for b in range(4):
                tag = tag_of(a, b)
                sz_, sy_, sx_ = shp_of[tag]
                zparts = []
                for s, r0, nrows in zgroups:
                    g, nm = _og(src_exp[tag], src_rank(s, a, b), window)
                    miss = miss + nm
                    g = g.reshape(budget_out, sz_, sy_, sx_, c)
                    zparts.append(g[:, r0 - 1:r0 - 1 + nrows])
                row.append(jnp.concatenate(zparts, axis=1)
                           if len(zparts) > 1 else zparts[0])
            bands.append(jnp.concatenate(row, axis=3))
        return jnp.concatenate(bands, axis=2)   # (Bo, pzn, 2ty+2, 2tx+2, c)

    patch = assemble(exp, cin)
    mpatch = assemble(mexp, 1)

    # ---- stride-2 VALID conv (z-decomposed) ----------------------------
    wk = w.reshape(tuple(ksize) + w.shape[1:])
    xp_ = patch
    if compute_dtype is not None:
        xp_ = xp_.astype(compute_dtype)
        wk = wk.astype(compute_dtype)
    cout = w.shape[-1]
    out = None
    for iz in range(kz):
        zsl = jax.lax.slice_in_dim(xp_, iz, iz + 2 * (tz_out - 1) + 1, 2,
                                   axis=1)
        planes = zsl.reshape((zsl.shape[0] * tz_out,) + zsl.shape[2:])
        o = jax.lax.conv_general_dilated(
            planes, wk[iz], (2, 2), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        out = o if out is None else out + o
    out = out.reshape(budget_out, tz_out, ty, tx, cout).astype(y.dtype)

    mout = jax.lax.reduce_window(
        mpatch, -jnp.inf, jax.lax.max,
        (1, kz, 3, 3, 1), (1, 2, 2, 2, 1), "VALID")
    mout = (mout > 0).astype(mask.dtype)
    zin = (tpos[:, 0:1] * tz_out + jnp.arange(tz_out)[None, :]) < d_out
    yin = (tpos[:, 1:2] * ty + jnp.arange(ty)[None, :]) < grid_out[1]
    xin = (tpos[:, 2:3] * tx + jnp.arange(tx)[None, :]) < grid_out[2]
    mout = (mout * zin[:, :, None, None, None].astype(mout.dtype)
            * yin[:, None, :, None, None].astype(mout.dtype)
            * xin[:, None, None, :, None].astype(mout.dtype))
    mout = mout * tvalid[:, None, None, None, None].astype(mout.dtype)
    out = out * mout.astype(out.dtype)

    # ---- budget-drop telemetry (same math as tile_conv) ----------------
    zsum = jnp.sum(mask.reshape(t1, tzp, ty, tx)[:t1 - 1, 1:tz + 1],
                   axis=(2, 3))
    absz = zlo_in[:, None] + jnp.arange(tz, dtype=jnp.int32)[None, :]
    rlo = jnp.clip(-(-(absz + pz - kz + 1) // 2), 0, d_out - 1)
    rhi = jnp.clip((absz + pz) // 2, 0, d_out - 1)
    missed_tiles = []
    for r_ in (rlo, rhi):
        k_ = ((r_ // tz_out) * nbyo + byo[:, None]) * nbxo + bxo[:, None]
        k_ = jnp.where(ts.valid[:, None], k_, nbzo * nbyo * nbxo)
        missed_tiles.append(tmap_out[k_] >= budget_out)
    lost = missed_tiles[0] & missed_tiles[1] & ts.valid[:, None]
    n_drop = jnp.sum(jnp.where(lost, zsum, 0.0)).astype(jnp.int32)

    nbr = TC._neighbor_ranks(tpos, tvalid, tmap_out, nbzo, nbyo, nbxo,
                             budget_out)
    ts_out = TC.TileSet(tpos, tvalid, nbr, tmap_out, n_out, n_drop)

    # to plane rows: (Bo+1 phantom, tz_out -> +2 halo rows) zero-padded
    out = _pad_phantom(out)
    mout = _pad_phantom(mout)
    zpad = ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0))
    y_out = jnp.pad(out, zpad).reshape(-1, ty, tx, cout)
    m_out = jnp.pad(mout, zpad).reshape(-1, ty, tx, 1)
    return y_out, m_out, ts_out, grid_out, miss


def to_dense(y: jnp.ndarray, ts: TC.TileSet, grid: Sequence[int],
             tz: int) -> jnp.ndarray:
    """Interior plane rows -> dense (D, H, W, C) via per-chunk rank takes
    (tile counts are small wherever this runs — late stages / stage
    transitions)."""
    d, h, w = grid
    n, ty, tx, c = y.shape
    tzp = tz + 2
    t1 = n // tzp
    nbz, nby, nbx = TC.tile_counts(grid, ty, tx, tz)
    interior = y.reshape(t1, tzp, ty, tx, c)[:, 1:tz + 1]
    ranks = ts.tmap[:nbz * nby * nbx]
    g = interior[ranks]
    g = g.reshape(nbz, nby, nbx, tz, ty, tx, c)
    g = jnp.transpose(g, (0, 3, 1, 4, 2, 5, 6))
    g = g.reshape(nbz * tz, nby * ty, nbx * tx, c)
    return g[:d, :h, :w, :]


def rows_from_planes(p_or_y: jnp.ndarray, row_slot: jnp.ndarray,
                     padded: bool) -> jnp.ndarray:
    """Gather (V, C) rows back out. ``padded``: p (N, ty+2, tx+2, C) uses
    row_slot directly; interior y (N, ty, tx, C) needs no halo offset
    adjustment because row_slot indexes the halo-padded space — pass
    padded=False only with a freshly padded view."""
    if not padded:
        p_or_y = jnp.pad(p_or_y, ((0, 0), (1, 1), (1, 1), (0, 0)))
    n, typ_, txp, c = p_or_y.shape
    flat = p_or_y.reshape(-1, c)
    ok = (row_slot >= 0) & (row_slot < flat.shape[0])
    return flat[jnp.clip(row_slot, 0, flat.shape[0] - 1)] * \
        ok[:, None].astype(p_or_y.dtype)
