"""Planes-layout z-chunked BEV-tile engine: the fast TPU tile backend.

Same tile semantics as ops/tile_conv.py (fixed z-chunks, exact 26-direction
neighborhoods, exact strided downsample — that module stays as the
small-scale oracle these kernels are tested against), but laid out and
scheduled for the real chip:

- persistent state is INTERIOR PLANE ROWS y (N, ty, tx, C) with
  N = (T+1)*tz — no halo storage at all. XLA's conv path consumes
  rank-4 plane args directly; any tile-major 5D/6D materialization at a
  reshape->conv or concat->reshape edge forces a (16,128)-tiled relayout
  that pads conv1-scale buffers 13-21x (measured 11-21 GB copies, OOM).
- the submanifold conv needs only XY halos on its 2D-conv input, built by
  concatenating 8 one-hot-gathered neighbor edge exports around the
  interior (ops/onehot_gather.py): tile ranks are lexicographic in
  (bz, by, bx), so every neighbor-rank map is monotone with bounded
  per-block spread, and the gather runs at MXU matmul speed (XLA's
  native gather moves only ~0.14-0.5 Mrows/ms, measured).
- z taps never need halo planes: with the z-packed conv (Cout' = 3*Cout)
  the z-neighbor contribution to a tile's edge row equals the NEIGHBOR'S
  OWN already-computed u row — imported by 2 more one-hot gathers and
  patched into the per-tile edge rows with static slice updates. The
  diagonal (z+-1, y+-1, x+-1) directions arrive through the neighbor's u
  because its conv already consumed its xy halos. 10 gathers per conv
  total, all wide rows.
- everything is differentiable XLA (one-hot contractions transpose
  cleanly); training needs no custom_vjp. Window misses are exact-patched
  AND counted; tile-budget overflow is counted (telemetry, never silent).

Matches the spconv role of reference det3d/models/backbones/scn.py:89-185.
Parity: tests/test_tile_planes.py pins every op against ops/tile_conv.py
(itself pinned to the gather-GEMM/dense oracle), including gradients.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _pet(x):
    """preferred_element_type for MXU ops: f32 outputs for f32 inputs; for
    bf16 inputs leave the output bf16 (the MXU accumulates f32 internally
    either way, and callers cast right after) — requesting f32 outputs from
    bf16 operands breaks the AD transpose (dtype-mismatched cotangents)."""
    import jax.numpy as _jnp
    return _jnp.float32 if x.dtype == _jnp.float32 else None

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


def _og(table, idx, window):
    """onehot_gather_exact with 128-padded index stream; contracts in the
    table's own dtype (bf16 one-hot gathers are exact anyway: each output
    is a single product by 1.0 accumulated in f32)."""
    m = idx.shape[0]
    mp = -(-m // 128) * 128
    idxp = jnp.pad(idx, (0, mp - m), constant_values=-1)
    out, nmiss = onehot_gather_exact(table, idxp, window,
                                     compute_dtype=table.dtype)
    return out[:m], nmiss


def row_slots(coords: jnp.ndarray, ts: TC.TileSet, grid: Sequence[int],
              ty: int, tx: int, tz: int):
    """Interior plane-row slot of each (z, y, x) row: flat index into the
    (T+1, tz, ty, tx) space; NSLOT for padded/overflow rows."""
    nbz, nby, nbx = TC.tile_counts(grid, ty, tx, tz)
    budget = ts.tile_pos.shape[0]
    z, y, x = coords[:, 0], coords[:, 1], coords[:, 2]
    valid = jnp.all(coords >= 0, axis=-1)
    key = ((z // tz) * nby + y // ty) * nbx + x // tx
    rank = ts.tmap[jnp.where(valid, key, nbz * nby * nbx)]
    in_set = valid & (rank < budget)
    zi = z - (z // tz) * tz
    yi = y - (y // ty) * ty
    xi = x - (x // tx) * tx
    nslot = (budget + 1) * tz * ty * tx
    flat = ((rank * tz + zi) * ty + yi) * tx + xi
    return jnp.where(in_set, flat, nslot).astype(jnp.int32), in_set


def scatter_rows(feats: jnp.ndarray, slot: jnp.ndarray, ts: TC.TileSet,
                 tz: int, ty: int, tx: int) -> jnp.ndarray:
    """(V, C) rows -> interior plane rows (N, ty, tx, C)."""
    t1 = ts.tile_pos.shape[0] + 1
    c = feats.shape[-1]
    nslot = t1 * tz * ty * tx
    buf = jnp.zeros((nslot, c), feats.dtype).at[slot].add(feats, mode="drop")
    return buf.reshape(t1 * tz, ty, tx, c)


def build_mask(slot: jnp.ndarray, ts: TC.TileSet, tz: int, ty: int,
               tx: int) -> jnp.ndarray:
    """Interior active mask (N, ty, tx, 1)."""
    t1 = ts.tile_pos.shape[0] + 1
    nslot = t1 * tz * ty * tx
    m = jnp.zeros((nslot, 1), jnp.float32).at[slot].max(
        jnp.ones((slot.shape[0], 1), jnp.float32), mode="drop")
    return m.reshape(t1 * tz, ty, tx, 1)


def rows_from_planes(y: jnp.ndarray, slot: jnp.ndarray) -> jnp.ndarray:
    """(V, C) rows gathered back out of interior plane rows."""
    n, ty, tx, c = y.shape
    flat = y.reshape(-1, c)
    ok = (slot >= 0) & (slot < flat.shape[0])
    return flat[jnp.clip(slot, 0, flat.shape[0] - 1)] * \
        ok[:, None].astype(y.dtype)


def _corr_col(ext, wcat, k, cin, kx_idx):
    """Correction for a missing input COLUMN: ext (M, (k+2)*C) holds the
    column cells extended by one cell on each end (zeros for x columns —
    their corner taps belong to the row strips). Returns (M, k, 3Co) =
    sum_a ext[i+a] @ wcat[a, kx_idx]."""
    m = ext.shape[0]
    co3 = wcat.shape[-1]
    acc = None
    for a in range(3):
        sl = jax.lax.dynamic_slice_in_dim(ext, a * cin, k * cin, 1)
        t = jnp.dot(sl.reshape(m * k, cin), wcat[a, kx_idx],
                    preferred_element_type=_pet(ext))
        acc = t if acc is None else acc + t
    return acc.reshape(m, k, co3)


def _corr_row(ext, wcat, k, cin, ky_idx):
    """Correction for a missing input ROW (corner cells INCLUDED in ext):
    (M, k, 3Co) = sum_b ext[j+b] @ wcat[ky_idx, b]."""
    m = ext.shape[0]
    co3 = wcat.shape[-1]
    acc = None
    for b in range(3):
        sl = jax.lax.dynamic_slice_in_dim(ext, b * cin, k * cin, 1)
        t = jnp.dot(sl.reshape(m * k, cin), wcat[ky_idx, b],
                    preferred_element_type=_pet(ext))
        acc = t if acc is None else acc + t
    return acc.reshape(m, k, co3)


def _edge_corrections(u, strips, wcat, ty, tx, cin):
    """Add the neighbor-tile contributions a zero-SAME-padded conv missed.

    Disjoint tap partition (out[i,j] = sum in[i+a-1, j+b-1] w[a,b]):
      row -1 incl. both corners  -> ylo strip, a = 0, windowed over b
      row ty incl. both corners  -> yhi strip, a = 2
      col -1 interior rows only  -> xlo strip (zero-extended), b = 0
      col tx interior rows only  -> xhi strip, b = 2
    strips: ym_ext/yp_ext (M, (tx+2)C), xm_ext/xp_ext (M, (ty+2)C zero-
    capped). u (M, ty, tx, 3Co) is updated with static-slice adds."""
    dt = u.dtype
    u = u.at[:, 0, :, :].add(
        _corr_row(strips["ym_ext"], wcat, tx, cin, 0).astype(dt))
    u = u.at[:, ty - 1, :, :].add(
        _corr_row(strips["yp_ext"], wcat, tx, cin, 2).astype(dt))
    u = u.at[:, :, 0, :].add(
        _corr_col(strips["xm_ext"], wcat, ty, cin, 0).astype(dt))
    u = u.at[:, :, tx - 1, :].add(
        _corr_col(strips["xp_ext"], wcat, ty, cin, 2).astype(dt))
    return u


def subm_conv(y: jnp.ndarray, mask: jnp.ndarray, ts: TC.TileSet, tz: int,
              w: jnp.ndarray, bias: Optional[jnp.ndarray] = None,
              compute_dtype=None, window: int = 256):
    """Submanifold 3x3x3 conv on interior plane rows.

    y (N, ty, tx, Cin), N = (T+1)*tz, tz >= 2; mask (N, ty, tx, 1);
    w (27, Cin, Cout) z-major taps (the checkpoint layout). Returns
    (y_out (N, ty, tx, Cout) masked, n_miss telemetry).

    No assembled halo-padded input exists anywhere: the conv runs
    zero-SAME-padded on the raw state (plus the two z-side neighbor
    planes appended to the batch), and the neighbor contributions the
    zero padding hid are added as edge-correction matmuls computed from
    one-hot-gathered 2D folded exports. Every intermediate is either a
    proven conv shape, a wide folded 2D array, or a static-slice update
    — the concat/pad formulations of small-C halo pieces materialize
    (8,128)-tiled relayouts that cost 100x the conv itself (measured,
    PERF.md round 3).
    """
    n, ty, tx, cin = y.shape
    t1 = n // tz
    assert tz >= 2, "z-chunk height must be >= 2"
    cout = w.shape[-1]
    wk = w.reshape(3, 3, 3, cin, cout)
    x = y
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        wk = wk.astype(compute_dtype)
    wcat = jnp.concatenate([wk[0], wk[1], wk[2]], axis=-1)  # (3,3,Cin,3Co)

    x6 = x.reshape(t1, tz, ty, tx, cin)
    miss = jnp.int32(0)

    def og(table, d):
        nonlocal miss
        out, nm = _og(table, _nbr(ts, d), window)
        miss = miss + nm
        return _pad_phantom(out)

    # folded 2D boundary exports of the current features
    exl = x6[:, :, :, 0, :].reshape(t1, tz * ty * cin)
    exh = x6[:, :, :, tx - 1, :].reshape(t1, tz * ty * cin)
    eyl = x6[:, :, 0, :, :].reshape(t1, tz * tx * cin)
    eyh = x6[:, :, ty - 1, :, :].reshape(t1, tz * tx * cin)
    c00 = x6[:, :, 0, 0, :].reshape(t1, tz * cin)
    c0x = x6[:, :, 0, tx - 1, :].reshape(t1, tz * cin)
    cx0 = x6[:, :, ty - 1, 0, :].reshape(t1, tz * cin)
    cxx = x6[:, :, ty - 1, tx - 1, :].reshape(t1, tz * cin)

    def per_row(g2d, width):
        # (T1, tz*width) gathered export -> per-plane-row (N, width)
        return g2d.reshape(t1, tz, width).reshape(n, width)

    zc = ((0, 0), (cin, cin))
    main_strips = {
        "ym_ext": jnp.concatenate(
            [per_row(og(cxx, (0, -1, -1)), cin),
             per_row(og(eyh, (0, -1, 0)), tx * cin),
             per_row(og(cx0, (0, -1, 1)), cin)], axis=-1),
        "yp_ext": jnp.concatenate(
            [per_row(og(c0x, (0, 1, -1)), cin),
             per_row(og(eyl, (0, 1, 0)), tx * cin),
             per_row(og(c00, (0, 1, 1)), cin)], axis=-1),
        "xm_ext": jnp.pad(per_row(og(exh, (0, 0, -1)), ty * cin), zc),
        "xp_ext": jnp.pad(per_row(og(exl, (0, 0, 1)), ty * cin), zc),
    }

    # z-side neighbor planes (abs z = z0 - 1 and z0 + tz) with their own
    # edge corrections from the z-diagonal neighbors — appended to the
    # conv batch so one conv call serves all three
    zt = x6[:, tz - 1].reshape(t1, ty * tx * cin)
    zb = x6[:, 0].reshape(t1, ty * tx * cin)
    zt_exl = x6[:, tz - 1, :, 0, :].reshape(t1, ty * cin)
    zt_exh = x6[:, tz - 1, :, tx - 1, :].reshape(t1, ty * cin)
    zt_eyl = x6[:, tz - 1, 0, :, :].reshape(t1, tx * cin)
    zt_eyh = x6[:, tz - 1, ty - 1, :, :].reshape(t1, tx * cin)
    zt_c = [x6[:, tz - 1, a, b, :] for a, b in
            ((0, 0), (0, tx - 1), (ty - 1, 0), (ty - 1, tx - 1))]
    zb_exl = x6[:, 0, :, 0, :].reshape(t1, ty * cin)
    zb_exh = x6[:, 0, :, tx - 1, :].reshape(t1, ty * cin)
    zb_eyl = x6[:, 0, 0, :, :].reshape(t1, tx * cin)
    zb_eyh = x6[:, 0, ty - 1, :, :].reshape(t1, tx * cin)
    zb_c = [x6[:, 0, a, b, :] for a, b in
            ((0, 0), (0, tx - 1), (ty - 1, 0), (ty - 1, tx - 1))]

    def zside(core, ex_l, ex_h, ey_l, ey_h, cs, dz):
        plane = og(core, (dz, 0, 0)).reshape(t1 + 0, ty, tx, cin)
        strips = {
            "ym_ext": jnp.concatenate(
                [og(cs[3], (dz, -1, -1)), og(ey_h, (dz, -1, 0)),
                 og(cs[2], (dz, -1, 1))], axis=-1),
            "yp_ext": jnp.concatenate(
                [og(cs[1], (dz, 1, -1)), og(ey_l, (dz, 1, 0)),
                 og(cs[0], (dz, 1, 1))], axis=-1),
            "xm_ext": jnp.pad(og(ex_h, (dz, 0, -1)), zc),
            "xp_ext": jnp.pad(og(ex_l, (dz, 0, 1)), zc),
        }
        return plane, strips

    zm_plane, zm_strips = zside(zt, zt_exl, zt_exh, zt_eyl, zt_eyh, zt_c, -1)
    zp_plane, zp_strips = zside(zb, zb_exl, zb_exh, zb_eyl, zb_eyh, zb_c, 1)

    p_ext = jnp.concatenate([x, zm_plane, zp_plane], axis=0)
    u_ext = jax.lax.conv_general_dilated(
        p_ext, wcat, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=_pet(p_ext))
    # partial z-sums accumulate in the compute dtype (each 2D conv already
    # accumulated f32 internally); keeping u f32 doubles the GB-scale
    # traffic of the big stages (same policy as the dense z-decomposition)
    u_ext = u_ext.astype(x.dtype)
    u = _edge_corrections(u_ext[:n], main_strips, wcat, ty, tx, cin)
    u_zm = _edge_corrections(u_ext[n:n + t1], zm_strips, wcat, ty, tx, cin)
    u_zp = _edge_corrections(u_ext[n + t1:], zp_strips, wcat, ty, tx, cin)

    # flat z-shift: correct for interior rows zi in [1, tz-2]; tile z-edge
    # rows take their out-of-chunk term from the z-side plane convs
    core = (u[0:n - 2, :, :, 0:cout] + u[1:n - 1, :, :, cout:2 * cout]
            + u[2:n, :, :, 2 * cout:3 * cout])
    yf = jnp.pad(core, ((1, 1), (0, 0), (0, 0), (0, 0)))
    u6 = u.reshape(t1, tz, ty, tx, 3 * cout)
    y_lo = (u_zm[:, :, :, 0:cout] + u6[:, 0, :, :, cout:2 * cout]
            + u6[:, 1, :, :, 2 * cout:])
    y_hi = (u6[:, tz - 2, :, :, 0:cout] + u6[:, tz - 1, :, :, cout:2 * cout]
            + u_zp[:, :, :, 2 * cout:])
    y6o = yf.reshape(t1, tz, ty, tx, cout)
    y6o = jax.lax.dynamic_update_slice_in_dim(y6o, y_lo[:, None], 0, axis=1)
    y6o = jax.lax.dynamic_update_slice_in_dim(y6o, y_hi[:, None], tz - 1,
                                              axis=1)
    out = y6o.reshape(n, ty, tx, cout).astype(y.dtype)
    if bias is not None:
        out = out + bias
    return out * mask.astype(out.dtype), miss


def zconv(y: jnp.ndarray, mask: jnp.ndarray, w: jnp.ndarray, d: int, tz: int,
          compute_dtype=None):
    """extra_conv: (3,1,1) stride (2,1,1) padding 0, single z-chunk
    (tz >= d). Returns (out (T1, d2, ty, tx, Cout), mask_out)."""
    n, ty, tx, cin = y.shape
    t1 = n // tz
    assert tz >= d
    d2 = (d - 3) // 2 + 1
    wk = w.reshape(3, cin, -1)
    x6 = y.reshape(t1, tz, ty, tx, cin)
    m6 = mask.reshape(t1, tz, ty, tx, 1)
    if compute_dtype is not None:
        x6 = x6.astype(compute_dtype)
        wk = wk.astype(compute_dtype)
    out = None
    for iz in range(3):
        zsl = jax.lax.slice_in_dim(x6, iz, iz + 2 * (d2 - 1) + 1, 2, axis=1)
        o = jnp.einsum("tzyxc,cd->tzyxd", zsl, wk[iz],
                       preferred_element_type=_pet(zsl))
        out = o if out is None else out + o
    out = out.astype(y.dtype)
    m = jax.lax.reduce_window(
        m6[:, :d], -jnp.inf, jax.lax.max, (1, 3, 1, 1, 1), (1, 2, 1, 1, 1),
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

    y (N, ty, tx, C) interior plane rows. Returns (y_out, mask_out,
    ts_out, grid_out, n_miss)."""
    d, h, w_g = grid
    n, ty, tx, cin = y.shape
    t1 = n // tz
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
    # a stride-2 k3 output of an input row at the tile's high edge lands
    # in the NEXT output tile (in_y = 4by+3 reaches y' = 2by+2, tile
    # (by+1)//2 != by//2 for odd by): enumerate BOTH y/x candidates or
    # those outputs are silently lost next to empty tiles (round-5 fix;
    # the input-voxel enumeration of ops/sparse_conv is the oracle)
    byo2 = (ts.tile_pos[:, 1] + 1) // 2
    bxo2 = (ts.tile_pos[:, 2] + 1) // 2
    cand = []
    for zp_ in (zplo, zphi):
        for yc in (byo, byo2):
            for xc in (bxo, bxo2):
                ok = ts.valid & (yc < nbyo) & (xc < nbxo)
                k_ = ((zp_ // tz_out) * nbyo + yc) * nbxo + xc
                cand.append(jnp.where(ok, k_, TC.BIG))
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

    y6 = y.reshape(t1, tz, ty, tx, cin)
    m6 = mask.reshape(t1, tz, ty, tx, 1)

    def make_exp(s6):
        c = s6.shape[-1]
        return {
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

    exp, mexp = make_exp(y6), make_exp(m6)

    def tag_of(a, b):
        ia = 0 if a == 0 else (2 if a == 3 else 1)
        ib = 0 if b == 0 else (2 if b == 3 else 1)
        return [["cxx", "yhi", "cx0"],
                ["xhi", "core", "xlo"],
                ["c0x", "ylo", "c00"]][ia][ib]

    shp_of = {
        "core": (ty, tx), "xlo": (ty, 1), "xhi": (ty, 1),
        "ylo": (1, tx), "yhi": (1, tx),
        "c00": (1, 1), "c0x": (1, 1), "cx0": (1, 1), "cxx": (1, 1),
    }

    miss = jnp.int32(0)

    def assemble(src_exp, c):
        nonlocal miss
        bands = []
        for a in range(4):
            row = []
            for b in range(4):
                tag = tag_of(a, b)
                sy_, sx_ = shp_of[tag]
                zparts = []
                for s, r0, nrows in zgroups:
                    g, nm = _og(src_exp[tag], src_rank(s, a, b), window)
                    miss = miss + nm
                    g = g.reshape(budget_out, tz, sy_, sx_, c)
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
            preferred_element_type=_pet(planes))
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
    zsum = jnp.sum(m6[:t1 - 1, :, :, :, 0], axis=(2, 3))
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

    y_out = _pad_phantom(out).reshape(-1, ty, tx, cout)
    m_out = _pad_phantom(mout).reshape(-1, ty, tx, 1)
    return y_out, m_out, ts_out, grid_out, miss


def to_dense(y: jnp.ndarray, ts: TC.TileSet, grid: Sequence[int],
             tz: int) -> jnp.ndarray:
    """Interior plane rows -> dense (D, H, W, C) via per-chunk rank takes
    (tile counts are small wherever this runs — late stages / stage
    transitions)."""
    d, h, w = grid
    n, ty, tx, c = y.shape
    t1 = n // tz
    nbz, nby, nbx = TC.tile_counts(grid, ty, tx, tz)
    interior = y.reshape(t1, tz, ty, tx, c)
    ranks = ts.tmap[:nbz * nby * nbx]
    g = interior[ranks]
    g = g.reshape(nbz, nby, nbx, tz, ty, tx, c)
    g = jnp.transpose(g, (0, 3, 1, 4, 2, 5, 6))
    g = g.reshape(nbz * tz, nby * ty, nbx * tx, c)
    return g[:d, :h, :w, :]
