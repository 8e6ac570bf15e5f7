"""Separable-matching sparse 3D convolution engine ("sep"), TPU-native.

The third-generation engine for the spconv role (reference
det3d/models/backbones/scn.py:89-288, external spconv lib). The gather
engine (ops/sparse_conv.py) pays 27 row-gathers per output row; the window
engine (ops/window_conv.py) removes gathers but pays one-hot MXU MACs
proportional to window*Cin per tap. This engine factorizes the 3x3x3
neighbor access as (in-plane match) x (z-neighborhood), cutting the per-row
gather count to 9 while staying EXACT:

1. rows are sorted by the guard-banded (y, x, z) key (ops/window_conv
   yxz_lin), so a row's z-neighbor CELLS key+-1, key+-2 can only live at
   its rank neighbors r+-1, r+-2 (guard bands prevent cross-column wraps).
   Z5[r] stacks those five cells' features with pure masked rank shifts —
   the whole z extent of the kernel costs no matching at all;
2. the 9 (dy, dx) tap columns are matched DIRECTLY (per-axis composition
   would be wrong: a diagonal's intermediate cell may be empty while the
   diagonal cell is occupied) through a per-stage COVERAGE rank grid:
   every input row registers at its cell and both z-neighbor cells, so a
   lookup at tap-column center c finds an input row within |key - c| <= 1
   whenever ANY of the column's 3 tap cells is occupied. dzsel = key - c
   realigns the gathered Z5 to the tap cells (exactness: |dzsel| <= 1 and
   |dz| <= 1 keep all taps inside the gathered +-2 neighborhood);
3. a conv is then, per tap column b: one row-gather of Z5, a static
   realignment select, and a (V, kz*Cin) @ (kz*Cin, Cout) MXU matmul —
   9 gathers + 9 exact-FLOP matmuls, no windows, no residual pass, no
   coverage budget to overflow. Submanifold and strided convs share the
   machinery (subm = stride 1, output rows = input rows);
4. everything is plain XLA (gathers, matmuls, shifts), so jax.grad works
   natively — this engine trains.

STATUS: test oracle, not a production engine. Measured on the chip the
9-gather matching level is still row-gather-bound, so the shipped flagship
path is the window engine (ops/window_conv.py + its Pallas kernel); this
engine stays as an independent exact formulation that cross-checks the
others in tests/test_sepconv.py.

Matches the role of spconv.SubMConv3d / SparseConv3d consumed at reference
scn.py:104-152; parity vs the gather oracle is pinned in
tests/test_sepconv.py (which chains to the dense-conv oracle).
"""
from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .window_conv import MISS, key_dims, sort_rows, yxz_lin


class SepPlan(NamedTuple):
    """Per-stage matching structure, shared by every conv of the stage.

    perm[:, b] holds, for tap column b (b = (dx+1)*ny + (dy+1) over the
    kernel's in-plane extent), the SORTED input rank of the coverage match
    at that column's center cell; -1 when the column's 3 tap cells are all
    empty. dzsel in {-1, 0, 1} is (matched key - center key).
    """

    out_lin: jnp.ndarray  # (Vo,) sorted output keys (output grid), MISS pad
    perm: jnp.ndarray     # (Vo, ext) coverage-matched input rank, -1 absent
    dzsel: jnp.ndarray    # (Vo, ext) int32 alignment offset of the match
    in_lin: jnp.ndarray   # (V_in,) sorted input keys (z5 presence deltas)


def coverage_rank_grid(in_lin: jnp.ndarray,
                       grid: Sequence[int]) -> jnp.ndarray:
    """Dense key->rank table where every sorted input row registers at its
    own cell and both z-neighbor cells (max-combine; deterministic).
    in_lin must be sorted; padded rows (MISS) land in the overflow slot."""
    kd, kh, kw = key_dims(grid)
    size = kd * kh * kw
    v = in_lin.shape[0]
    valid = in_lin < MISS
    rg = jnp.full((size + 1,), -1, jnp.int32)
    ranks = jnp.arange(v, dtype=jnp.int32)
    for off in (-1, 0, 1):
        tgt = jnp.where(valid, jnp.clip(in_lin + off, 0, size - 1), size)
        rg = rg.at[tgt].max(ranks, mode="drop")
    return rg


def make_sep_plan(in_lin, out_lin, out_coords, grid_in,
                  stride=(1, 1, 1), padding=(1, 1, 1), ksize=(3, 3, 3),
                  rg: jnp.ndarray = None) -> SepPlan:
    """Plan a conv stage. For submanifold convs pass the input rows as
    outputs (out_lin = in_lin, out_coords = the sorted coords); for strided
    convs pass the coarse active set from downsample_active_set_yxz.
    ``rg`` (coverage_rank_grid of in_lin) may be shared by a stage's subm
    and strided plans."""
    kd, kh, kw = key_dims(grid_in)
    size = kd * kh * kw
    kz, ky, kx = ksize
    sz, sy, sx = stride
    pz, py, px = padding
    cz, cy, cx = (kz - 1) // 2, (ky - 1) // 2, (kx - 1) // 2
    if rg is None:
        rg = coverage_rank_grid(in_lin, grid_in)

    oz = out_coords[..., 0] * sz - pz + cz
    oy = out_coords[..., 1] * sy - py + cy
    ox = out_coords[..., 2] * sx - px + cx
    valid_out = out_lin < MISS
    d, h, w = grid_in
    dys = (-1, 0, 1) if ky == 3 else (0,)
    dxs = (-1, 0, 1) if kx == 3 else (0,)
    perms, dzsels = [], []
    for dx in dxs:
        for dy in dys:
            yy, xx = oy + dy, ox + dx
            ok = valid_out & (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
            # z may stick one cell outside the grid (pad); its guard cell
            # exists in key space and is empty, so the lookup just misses
            ckey = ((yy + 1) * kw + (xx + 1)) * kd + (oz + 1)
            ckey = jnp.clip(ckey, 0, size - 1)
            r = jnp.where(ok, rg[jnp.where(ok, ckey, size)], -1)
            key_r = jnp.where(r >= 0, in_lin[jnp.maximum(r, 0)], 0)
            dz = jnp.where(r >= 0, key_r - ckey, 0)
            perms.append(r)
            dzsels.append(dz)
    perm = jnp.stack(perms, axis=-1).astype(jnp.int32)
    dzsel = jnp.stack(dzsels, axis=-1).astype(jnp.int32)
    return SepPlan(out_lin, perm, dzsel, in_lin)


def build_z5(feats: jnp.ndarray, plan: SepPlan) -> jnp.ndarray:
    """(V_in, C) -> (V_in, 5, C): the features of cells key-2 .. key+2,
    zeros where absent, via masked rank shifts.

    Cell key+2 may live at rank r+1 (when key+1 is EMPTY) or rank r+2 (when
    key+1 is occupied) — presence is decided by the actual key deltas of the
    rank neighbors, not by rank arithmetic alone. Guard bands keep key+-2
    from ever aliasing a real cell of an adjacent column (each column has an
    empty guard cell on both z ends)."""
    v, cin = feats.shape
    dt = feats.dtype
    lin = plan.in_lin
    valid = lin < MISS
    z1 = jnp.zeros((1, cin), dt)
    z2 = jnp.zeros((2, cin), dt)
    big = jnp.asarray(MISS, lin.dtype)
    nxt1 = jnp.concatenate([lin[1:], jnp.full((1,), big)])
    nxt2 = jnp.concatenate([lin[2:], jnp.full((2,), big)])
    prv1 = jnp.concatenate([jnp.full((1,), big), lin[:-1]])
    prv2 = jnp.concatenate([jnp.full((2,), big), lin[:-2]])
    f_r1u = jnp.concatenate([feats[1:], z1])
    f_r2u = jnp.concatenate([feats[2:], z2])
    f_r1d = jnp.concatenate([z1, feats[:-1]])
    f_r2d = jnp.concatenate([z2, feats[:-2]])

    def pick(cond_a, f_a, cond_b, f_b):
        sel_a = (valid & cond_a)[:, None].astype(dt)
        sel_b = (valid & cond_b & ~cond_a)[:, None].astype(dt)
        return f_a * sel_a + f_b * sel_b

    f1u = f_r1u * (valid & (nxt1 == lin + 1))[:, None].astype(dt)
    f1d = f_r1d * (valid & (prv1 == lin - 1))[:, None].astype(dt)
    # key+2 at rank r+1 (key+1 empty) else rank r+2 (needs nxt1 == key+1)
    f2u = pick(nxt1 == lin + 2, f_r1u,
               (nxt1 == lin + 1) & (nxt2 == lin + 2), f_r2u)
    f2d = pick(prv1 == lin - 2, f_r1d,
               (prv1 == lin - 1) & (prv2 == lin - 2), f_r2d)
    return jnp.stack([f2d, f1d, feats, f1u, f2u], axis=1)


def sep_conv(feats: jnp.ndarray, plan: SepPlan, weights: jnp.ndarray,
             bias=None, ksize: Tuple[int, int, int] = (3, 3, 3),
             compute_dtype=None, impl: str = "auto") -> jnp.ndarray:
    """Sparse conv (submanifold or strided, per the plan). feats (V_in, Cin)
    in the plan's sorted row order; weights (K, Cin, Cout) in the
    gather-engine z-major tap order (kz, ky, kx nested — the checkpoint
    layout). Returns (V_out, Cout). Exact parity with the gather engine.

    ``impl`` is kept for API stability; the only implementation is the XLA
    formulation (this engine is a test oracle — see module docstring).
    compute_dtype (e.g. bf16) casts matmul inputs; accumulation stays f32."""
    del impl
    return _sep_conv_xla(feats, plan, weights, bias, ksize, compute_dtype)


def _sep_conv_xla(feats, plan, weights, bias, ksize, compute_dtype):
    v_in, cin = feats.shape
    cout = weights.shape[-1]
    kz, ky, kx = ksize
    cz = (kz - 1) // 2
    cd = compute_dtype
    z5 = build_z5(feats if cd is None else feats.astype(cd), plan)

    dys = (-1, 0, 1) if ky == 3 else (0,)
    dxs = (-1, 0, 1) if kx == 3 else (0,)
    cy, cx = (ky - 1) // 2, (kx - 1) // 2
    wz = weights.reshape(kz, ky, kx, cin, cout)
    out = jnp.zeros((plan.out_lin.shape[0], cout), jnp.float32)
    b = 0
    for dx in dxs:
        for dy in dys:
            r = plan.perm[:, b]
            m = (r >= 0).astype(z5.dtype)[:, None, None]
            g = z5[jnp.maximum(r, 0)] * m          # (Vo, 5, C)
            # tap oz (dz = oz - cz) lives at Z5 slot (dz - dzsel) + 2;
            # |dzsel| <= 1 and |dz| <= 1 keep it inside [0, 4]
            idx = (jnp.arange(kz)[None, :] - cz) - plan.dzsel[:, b][:, None] + 2
            sel = jnp.take_along_axis(g, idx[..., None], axis=1)
            selr = sel.reshape(sel.shape[0], kz * cin)
            wblk = wz[:, dy + cy, dx + cx].reshape(kz * cin, cout)
            if cd is not None:
                wblk = wblk.astype(cd)
            out = out + jnp.dot(selr, wblk,
                                preferred_element_type=jnp.float32)
            b += 1
    out = out.astype(feats.dtype)
    if bias is not None:
        out = out + bias
    return out * (plan.out_lin < MISS)[:, None].astype(out.dtype)


# Backwards-compatible aliases used by the backbone/tests ---------------------

def make_subm_plan_sep(lin, coords, grid, rg=None) -> SepPlan:
    """Submanifold plan: output rows are the (sorted) input rows."""
    return make_sep_plan(lin, lin, coords, grid, (1, 1, 1), (1, 1, 1),
                         (3, 3, 3), rg=rg)


def make_strided_plan_sep(in_lin, out_lin, out_coords, grid_in, stride,
                          padding, ksize=(3, 3, 3), rg=None) -> SepPlan:
    return make_sep_plan(in_lin, out_lin, out_coords, grid_in, stride,
                         padding, ksize, rg=rg)


def subm_conv_sep(feats, plan, weights, bias=None, ksize=(3, 3, 3),
                  compute_dtype=None, impl: str = "auto"):
    return sep_conv(feats, plan, weights, bias, ksize, compute_dtype, impl)


def strided_conv_sep(feats, plan, weights, bias=None, ksize=(3, 3, 3),
                     compute_dtype=None, impl: str = "auto"):
    return sep_conv(feats, plan, weights, bias, ksize, compute_dtype, impl)
