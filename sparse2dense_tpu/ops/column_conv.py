"""Column-dense sparse 3D convolution (the TPU-native fast engine).

LiDAR voxel grids are sparse in BEV but their z extent is tiny (41 at Waymo
resolution), so instead of gathering 27 scalar rows per voxel (ops/
sparse_conv.py — bound by gather *transactions*), this engine keeps each
occupied BEV column DENSE in z:

    features (B, NC, D, C)   one z-dense slab per occupied (y, x) column
    cols     (B, NC, 2)      (y, x) int32, -1 padded
    zmask    (B, NC, D, 1)   voxel occupancy inside the column

A 3x3x3 submanifold conv becomes: gather the 8 neighbor columns (rows of
D*C = 2.6-11 KB — large contiguous HBM transactions), shift along z for the
3 z-taps, and run 27 big (B*NC*D, Cin)x(Cin, Cout) matmuls on the MXU; the
output is masked back to the active set, which keeps it exactly equal to the
gather-GEMM/spconv operator. Strided convs: the output column set is the
2D dilation of the occupied columns (<= 4 candidates per column after the
exact-tap argument), z handled densely inside the slab.

Weights are (27, Cin, Cout) with z-major tap order — identical layout to
ops/sparse_conv.gather_conv, so parameters interchange between engines.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------- conversion

def rows_to_columns(features, coords, valid, grid, col_budget: int):
    """(B, V, C) voxel rows + zyx coords -> column tensor.

    Returns (col_feats (B, NC, D, C), cols (B, NC, 2) yx, col_valid (B, NC),
    zmask (B, NC, D, 1)). Column order is ascending BEV linear id; overflow
    beyond ``col_budget`` drops the highest ids deterministically.
    """
    d, h, w = (int(g) for g in grid)
    b, v, c = features.shape

    def one(feats, cds, vld):
        col_lin = cds[:, 1] * w + cds[:, 2]
        col_lin = jnp.where(vld & (col_lin >= 0), col_lin, h * w)
        order = jnp.argsort(col_lin)
        slin = col_lin[order]
        is_first = jnp.concatenate(
            [jnp.ones((1,), bool), slin[1:] != slin[:-1]]
        ) & (slin < h * w)
        slot_of_sorted = jnp.cumsum(is_first.astype(jnp.int32)) - 1
        slot_of_sorted = jnp.where(slin < h * w,
                                   jnp.minimum(slot_of_sorted, col_budget),
                                   col_budget)
        # column slot for each ORIGINAL row
        slot = jnp.zeros((v,), jnp.int32).at[order].set(slot_of_sorted)
        zs = jnp.where(vld, cds[:, 0], 0)
        flat_idx = slot * d + zs  # into (col_budget+1)*D slabs
        flat_idx = jnp.where(vld & (slot < col_budget), flat_idx,
                             (col_budget + 1) * d)
        slab = jnp.zeros(((col_budget + 1) * d + 1, c), features.dtype)
        slab = slab.at[flat_idx].set(feats, mode="drop")
        zm = jnp.zeros(((col_budget + 1) * d + 1, 1), features.dtype)
        zm = zm.at[flat_idx].set(1.0, mode="drop")
        col_feats = slab[:col_budget * d].reshape(col_budget, d, c)
        zmask = zm[:col_budget * d].reshape(col_budget, d, 1)
        # column coords from representative lin
        col_id = jnp.full((col_budget + 1,), -1, jnp.int32).at[slot_of_sorted].max(
            slin.astype(jnp.int32), mode="drop")[:col_budget]
        col_valid = col_id >= 0
        safe = jnp.maximum(col_id, 0)
        cols = jnp.stack([safe // w, safe % w], axis=-1)
        cols = jnp.where(col_valid[:, None], cols, -1)
        return col_feats, cols, col_valid, zmask

    return jax.vmap(one)(features, coords, valid)


def build_col_table(cols, col_valid, hw: Tuple[int, int]):
    """(B, NC, 2) yx -> dense (B, H*W) column-id map (-1 empty)."""
    h, w = hw

    def one(cds, vld):
        lin = cds[:, 0] * w + cds[:, 1]
        lin = jnp.where(vld & (lin >= 0), lin, h * w)
        table = jnp.full((h * w + 1,), -1, jnp.int32)
        return table.at[lin].set(
            jnp.arange(cds.shape[0], dtype=jnp.int32), mode="drop"
        )[:h * w]

    return jax.vmap(one)(cols, col_valid)


def col_neighbor_table(cols, col_valid, table, hw: Tuple[int, int]):
    """(B, NC, 9) neighbor column ids (3x3 BEV window, row-major yx; -1 missing)."""
    h, w = hw
    offs = jnp.asarray([(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)],
                       jnp.int32)

    def one(cds, vld, tbl):
        nb = cds[:, None, :] + offs[None]
        ok = (nb[..., 0] >= 0) & (nb[..., 0] < h) & (nb[..., 1] >= 0) & (nb[..., 1] < w)
        lin = nb[..., 0] * w + nb[..., 1]
        idx = jnp.where(ok, tbl[jnp.clip(lin, 0, h * w - 1)], -1)
        return jnp.where(vld[:, None], idx, -1)

    return jax.vmap(one)(cols, col_valid, table)


# ----------------------------------------------------------------- convs

def _gather_one_tap(col_feats, nbr, s):
    """Gather one spatial neighbor's slabs: (B, NC, D, C), missing zeroed.
    One tap at a time keeps the transient at NC*D*C instead of 9x that."""
    b, nc, d, c = col_feats.shape
    flat = col_feats.reshape(b, nc, d * c)
    idx = nbr[:, :, s]
    g = jnp.take_along_axis(flat, jnp.maximum(idx, 0)[..., None], axis=1)
    m = (idx >= 0)[..., None].astype(col_feats.dtype)
    return (g * m).reshape(b, nc, d, c)


def col_subm_conv(col_feats, zmask, nbr, weights, bias=None):
    """Submanifold 3x3x3 conv in column layout.

    weights (27, Cin, Cout), z-major tap order (z*9 + (y*3+x)).
    Output masked to the active (column, z) set.
    """
    b, nc, d, cin = col_feats.shape
    cout = weights.shape[-1]
    out = jnp.zeros((b, nc, d, cout), col_feats.dtype)
    for s in range(9):
        g = _gather_one_tap(col_feats, nbr, s)  # (B, NC, D, Cin)
        for dz in (-1, 0, 1):
            # output[z] += slab[z + dz] @ W[k_z = dz + 1]
            if dz == -1:
                shifted = jnp.pad(g[:, :, :-1], ((0, 0), (0, 0), (1, 0), (0, 0)))
            elif dz == 1:
                shifted = jnp.pad(g[:, :, 1:], ((0, 0), (0, 0), (0, 1), (0, 0)))
            else:
                shifted = g
            out = out + jnp.einsum(
                "bndc,co->bndo", shifted, weights[(dz + 1) * 9 + s],
                preferred_element_type=jnp.float32,
            ).astype(col_feats.dtype)
    if bias is not None:
        out = out + bias
    return out * zmask


def col_z_strided_conv(col_feats, zmask, nbr, weights, z_pad: int,
                       d_out: int, bias=None):
    """Spatial 3x3 x z-stride-2 conv (the SparseConv3d(3, stride 2) z part).

    Equivalent to a dense conv with z stride 2 and padding ``z_pad`` inside
    each column; spatial neighbors gathered one tap at a time. Output z size
    ``d_out``; the new z occupancy is computed by the caller from zmask.
    """
    b, nc, d, cin = col_feats.shape
    cout = weights.shape[-1]
    out = jnp.zeros((b, nc, d_out, cout), col_feats.dtype)
    z_out_idx = jnp.arange(d_out)
    for s in range(9):
        g = _gather_one_tap(col_feats, nbr, s)
        for kz in range(3):
            zi = z_out_idx * 2 - z_pad + kz  # input z = z_out*2 - z_pad + kz
            okz = (zi >= 0) & (zi < d)
            zi_safe = jnp.clip(zi, 0, d - 1)
            sel = g[:, :, zi_safe] * okz[None, None, :, None].astype(
                col_feats.dtype)
            out = out + jnp.einsum(
                "bndc,co->bndo", sel, weights[kz * 9 + s],
                preferred_element_type=jnp.float32,
            ).astype(col_feats.dtype)
    if bias is not None:
        out = out + bias
    return out


def downsample_columns(cols, col_valid, hw_in, hw_out, col_budget: int):
    """2D strided (2, pad 1, k 3) column active set: per input column at
    (y, x) the candidate output columns are {q, q-1} per dim with
    q = (c+1)//2 — the 2D specialization of the exact-tap argument."""
    h_o, w_o = hw_out

    def one(cds, vld):
        q = (cds + 1) // 2
        deltas = jnp.asarray([[0, 0], [0, 1], [1, 0], [1, 1]], jnp.int32)
        o = q[:, None, :] - deltas[None]  # (NC, 4, 2)
        k = cds[:, None, :] + 1 - o * 2
        ok = vld[:, None] & jnp.all((k >= 0) & (k < 3), -1)
        ok &= (o[..., 0] >= 0) & (o[..., 0] < h_o) & (o[..., 1] >= 0) & (o[..., 1] < w_o)
        lin = jnp.where(ok, o[..., 0] * w_o + o[..., 1], h_o * w_o)
        flat = jnp.sort(lin.reshape(-1))
        is_first = jnp.concatenate(
            [jnp.ones((1,), bool), flat[1:] != flat[:-1]]
        ) & (flat < h_o * w_o)
        slot = jnp.cumsum(is_first.astype(jnp.int32)) - 1
        slot = jnp.where(is_first, jnp.minimum(slot, col_budget), col_budget)
        out_lin = jnp.full((col_budget + 1,), -1, jnp.int32).at[slot].max(
            flat.astype(jnp.int32), mode="drop")[:col_budget]
        out_valid = out_lin >= 0
        safe = jnp.maximum(out_lin, 0)
        out_cols = jnp.stack([safe // w_o, safe % w_o], -1)
        return jnp.where(out_valid[:, None], out_cols, -1), out_valid

    return jax.vmap(one)(cols, col_valid)


def strided_col_neighbor_table(out_cols, out_valid, in_table, hw_in):
    """(B, NCo, 9): input columns feeding each output column of a spatial
    stride-2 pad-1 k-3 conv: in = out*2 - 1 + k, k in 0..2 per dim."""
    h, w = hw_in
    offs = jnp.asarray([(ky, kx) for ky in range(3) for kx in range(3)], jnp.int32)

    def one(cds, vld, tbl):
        nb = cds[:, None, :] * 2 - 1 + offs[None]
        ok = (nb[..., 0] >= 0) & (nb[..., 0] < h) & (nb[..., 1] >= 0) & (nb[..., 1] < w)
        lin = nb[..., 0] * w + nb[..., 1]
        idx = jnp.where(ok, tbl[jnp.clip(lin, 0, h * w - 1)], -1)
        return jnp.where(vld[:, None], idx, -1)

    return jax.vmap(one)(out_cols, out_valid, in_table)


def z_mask_downsample(zmask, nbr, z_pad: int, d_out: int):
    """New z occupancy after a strided conv: dilation of the gathered
    neighborhood occupancy through the same stencil."""
    occ = col_z_strided_conv(zmask, jnp.ones_like(zmask), nbr,
                             jnp.ones((27, 1, 1), zmask.dtype), z_pad, d_out)
    return (occ > 0).astype(zmask.dtype)


def columns_to_rows(col_feats, cols, col_valid, zmask, budget: int):
    """Column tensor -> (features (B, V, C), coords (B, V, 3), valid) rows,
    for interop with the gather engine / BEV scatter."""
    b, nc, d, c = col_feats.shape

    def one(feats, cds, vld, zm):
        occ = (zm[..., 0] > 0) & vld[:, None]  # (NC, D)
        flat_occ = occ.reshape(-1)
        order = jnp.argsort(~flat_occ)  # occupied first, stable
        idx = order[:budget]
        taken = flat_occ[idx]
        col_i = idx // d
        z_i = idx % d
        f = feats.reshape(nc * d, c)[idx] * taken[:, None].astype(feats.dtype)
        coords = jnp.stack([z_i, cds[col_i, 0], cds[col_i, 1]], -1)
        coords = jnp.where(taken[:, None], coords, -1)
        return f, coords.astype(jnp.int32), taken

    return jax.vmap(one)(col_feats, cols, col_valid, zmask)


def col_z_only_strided_conv(col_feats, zmask, weights, d_out: int):
    """z-only (3,1,1) stride-(2,1,1) pad-0 conv inside each column (the
    backbones' extra_conv). weights (3, Cin, Cout)."""
    b, nc, d, cin = col_feats.shape
    cout = weights.shape[-1]
    x = col_feats * zmask
    out = jnp.zeros((b, nc, d_out, cout), col_feats.dtype)
    occ = jnp.zeros((b, nc, d_out, 1), col_feats.dtype)
    z_out = jnp.arange(d_out)
    for kz in range(3):
        zi = z_out * 2 + kz
        okz = (zi < d)
        zi_safe = jnp.clip(zi, 0, d - 1)
        sel = x[:, :, zi_safe] * okz[None, None, :, None].astype(x.dtype)
        out = out + jnp.einsum(
            "bndc,co->bndo", sel, weights[kz],
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        occ = occ + zmask[:, :, zi_safe] * okz[None, None, :, None].astype(x.dtype)
    return out, (occ > 0).astype(x.dtype)


def columns_to_dense(col_feats, cols, col_valid, zmask, grid):
    """Column tensor -> dense (B, D, H, W, C) + occupancy (B, D, H, W, 1)."""
    d, h, w = (int(g) for g in grid)
    b, nc, dd, c = col_feats.shape

    def one(feats, cds, vld, zm):
        lin = cds[:, 0] * w + cds[:, 1]
        lin = jnp.where(vld & (lin >= 0), lin, h * w)
        canvas = jnp.zeros((h * w + 1, dd, c), feats.dtype)
        canvas = canvas.at[lin].set(feats * zm, mode="drop")[:h * w]
        mcanvas = jnp.zeros((h * w + 1, dd, 1), feats.dtype)
        mcanvas = mcanvas.at[lin].set(zm, mode="drop")[:h * w]
        dense = jnp.transpose(canvas.reshape(h, w, dd, c), (2, 0, 1, 3))
        mask = jnp.transpose(mcanvas.reshape(h, w, dd, 1), (2, 0, 1, 3))
        return dense, mask

    return jax.vmap(one)(col_feats, cols, col_valid, zmask)


def columns_to_bev(col_feats, cols, col_valid, hw: Tuple[int, int]):
    """(B, NC, D, C) -> (B, H, W, C*D) BEV with channel index c*D+d (torch
    view(N, C*D, H, W) layout)."""
    b, nc, d, c = col_feats.shape
    h, w = hw
    per_col = jnp.transpose(col_feats, (0, 1, 3, 2)).reshape(b, nc, c * d)

    def one(pc, cds, vld):
        lin = cds[:, 0] * w + cds[:, 1]
        lin = jnp.where(vld & (lin >= 0), lin, h * w)
        canvas = jnp.zeros((h * w + 1, c * d), pc.dtype)
        return canvas.at[lin].set(pc, mode="drop")[:h * w].reshape(h, w, c * d)

    return jax.vmap(one)(per_col, cols, col_valid)
