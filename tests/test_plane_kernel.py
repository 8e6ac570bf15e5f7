"""Parity of the active-plane Pallas kernel (ops/pallas/plane_block_kernel
+ ops/plane_conv, (by, bx, z) rank order) against a dense zero-padded
submanifold conv oracle.

Runs the kernel in interpreter mode on CPU; Mosaic-lowered parity is
exercised on the real chip by the flagship bench.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sparse2dense_tpu.ops import tile_conv as TC
from sparse2dense_tpu.ops import tile_planes as TP
from sparse2dense_tpu.ops import plane_conv as PK

GRID = (8, 32, 32)


def scene(seed=0, v=500, n_pad=20):
    rng = np.random.RandomState(seed)
    lin = rng.choice(GRID[0] * GRID[1] * GRID[2], v, replace=False)
    z, y, x = lin // (GRID[1] * GRID[2]), (lin // GRID[2]) % GRID[1], \
        lin % GRID[2]
    coords = np.stack([z, y, x], -1).astype(np.int32)
    coords[-n_pad:] = -1
    return coords


# NOTE: oracle comparisons need DROP-FREE budgets (the dense oracle sees
# every voxel; the plane set drops planes beyond the budget, and cells next
# to a dropped plane would legitimately differ). GRID has 8*8*8=512 keys.
def build(coords, c, budget, dtype=jnp.float32, seed=1):
    rng = np.random.RandomState(seed)
    v = len(coords)
    feats = rng.randn(v, c).astype(np.float32)
    feats[np.all(coords < 0, 1)] = 0
    cj, fj = jnp.asarray(coords), jnp.asarray(feats, dtype)
    ts, _ = PK.build_plane_set(cj, GRID, budget)
    t1p = PK.t1p_of(budget)
    state, mask = PK.build_plane_state(fj, cj, ts, GRID, t1p)
    return ts, t1p, state, mask


def dense_subm_oracle(coords, feats, w, bias=None):
    """Exact submanifold 3x3x3 oracle: dense zero-padded conv, outputs
    kept at active sites only. Returns (V, Co) rows aligned to coords."""
    c, co = w.shape[1], w.shape[2]
    dense = np.zeros(GRID + (c,), np.float32)
    ok = (coords >= 0).all(1)
    dense[coords[ok, 0], coords[ok, 1], coords[ok, 2]] = np.asarray(
        feats)[ok]
    x = jnp.asarray(dense)[None]
    wk = jnp.asarray(w).reshape(3, 3, 3, c, co)
    y = jax.lax.conv_general_dilated(
        x, wk, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))[0]
    if bias is not None:
        y = y + bias
    out = np.zeros((len(coords), co), np.float32)
    out[ok] = np.asarray(y)[coords[ok, 0], coords[ok, 1], coords[ok, 2]]
    return out


def rows_to_state(rows, coords, ts, t1p):
    """Scatter oracle (V, Co) rows into the plane-state layout."""
    st, _ = PK.build_plane_state(jnp.asarray(rows), jnp.asarray(coords),
                                 ts, GRID, t1p)
    return st


def ref_vs_kernel(c, co, budget=512, relu=False, residual=False,
                  w0=None, wy=None, seed=0):
    coords = scene(seed)
    ts, t1p, state, mask = build(coords, c, budget, seed=seed)
    rng = np.random.RandomState(seed + 7)
    w = jnp.asarray(rng.randn(27, c, co).astype(np.float32)) * 0.2
    bias = jnp.asarray(rng.randn(co).astype(np.float32))
    # the same feats build() made (same seed)
    feats_rows = np.random.RandomState(seed).randn(len(coords), c) \
        .astype(np.float32)
    feats_rows[np.all(coords < 0, 1)] = 0

    y_rows = dense_subm_oracle(coords, feats_rows, np.asarray(w),
                               np.asarray(bias))
    if residual:
        assert c == co
        y_rows = y_rows + feats_rows
    if relu:
        y_rows = np.maximum(y_rows, 0.0)
    ref = rows_to_state(y_rows, coords, ts, t1p)

    exports = PK.make_plane_exports(state, c)
    plan = PK.make_plane_plan(ts, t1p, w0=w0 or t1p, wy=wy or t1p)
    assert int(plan.n_miss) == 0
    scale16, shift16 = PK.fold_epilogue(co, bias=bias)
    mask16 = PK.expand_mask(mask, co)
    out, exports_o = PK.pk_subm_conv(
        state, exports, plan, w, scale16, shift16, mask16,
        residual=state if residual else None,
        relu=relu, w0=w0 or t1p, wy=wy or t1p, interpret=True)

    m = np.asarray(PK.expand_mask(mask, co)) > 0
    np.testing.assert_allclose(np.asarray(out)[m], np.asarray(ref)[m],
                               rtol=2e-5, atol=2e-5)
    return out, exports_o, plan, (ts, t1p, state, mask)


def test_subm_parity_c16():
    # Co=16 -> 4Co=64 < 128: row-PAIR matmul mode
    ref_vs_kernel(c=16, co=16)


def test_subm_parity_c32():
    # Co=32 -> 4Co=128: per-row matmul mode
    ref_vs_kernel(c=32, co=32, budget=512)


def test_subm_parity_c16_to_32():
    ref_vs_kernel(c=16, co=32, budget=512, seed=2)


def test_subm_parity_relu_residual():
    ref_vs_kernel(c=16, co=16, relu=True, residual=True, seed=1)


def test_subm_parity_small_windows():
    # two-range 128-row windows must stay exact on the uniform scene
    ref_vs_kernel(c=16, co=16, w0=128, wy=128, seed=4)


def test_exports_match_rebuild():
    out, exports_o, _, _ = ref_vs_kernel(c=16, co=16, seed=3)
    exports_r = PK.make_plane_exports(out, 16)
    for ci, (a, b) in enumerate(zip(exports_o, exports_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6,
                                   err_msg=f"cluster {ci}")


def test_chained_convs_via_kernel_exports():
    c, budget = 16, 512
    coords = scene(5)
    ts, t1p, state, mask = build(coords, c, budget, seed=5)
    rng = np.random.RandomState(11)
    w1 = jnp.asarray(rng.randn(27, c, c).astype(np.float32)) * 0.2
    w2 = jnp.asarray(rng.randn(27, c, c).astype(np.float32)) * 0.2

    feats_rows = np.random.RandomState(5).randn(len(coords), c) \
        .astype(np.float32)
    feats_rows[np.all(coords < 0, 1)] = 0
    r1_rows = np.maximum(dense_subm_oracle(coords, feats_rows,
                                           np.asarray(w1)), 0.0)
    r2_rows = dense_subm_oracle(coords, r1_rows, np.asarray(w2))
    ref = rows_to_state(r2_rows, coords, ts, t1p)

    exports = PK.make_plane_exports(state, c)
    plan = PK.make_plane_plan(ts, t1p, w0=t1p, wy=t1p)
    sc1, sh1 = PK.fold_epilogue(c)
    mask16 = PK.expand_mask(mask, c)
    o1, exports_o = PK.pk_subm_conv(
        state, exports, plan, w1, sc1, sh1, mask16, relu=True,
        w0=t1p, wy=t1p, interpret=True)
    o2, _ = PK.pk_subm_conv(
        o1, exports_o, plan, w2, sc1, sh1, mask16, relu=False,
        w0=t1p, wy=t1p, interpret=True)

    m = np.asarray(mask16) > 0
    np.testing.assert_allclose(np.asarray(o2)[m], np.asarray(ref)[m],
                               rtol=2e-5, atol=2e-5)


def test_two_range_windows_cover_row_boundaries():
    """Small per-cluster windows stay exact: a dense bottom band of BEV
    rows next to sparse upper rows makes blocks straddle tile-row
    boundaries with bimodal dy-neighbor ranks; the second range covers
    them (miss -> 0) where one range cannot."""
    rng = np.random.RandomState(9)
    # dense band of low-y rows + sparse high-y rows, multi-z columns
    n_g, n_u = 600, 120
    gy = rng.choice(8 * 32 * 4, n_g, replace=False)  # y in [0, 4)
    coords_g = np.stack([gy % 8, (gy // 8) % 4, (gy // 32) % 32],
                        -1).astype(np.int64)
    uu = rng.choice(8 * 32 * 28, n_u, replace=False)
    coords_u = np.stack([uu % 8, 4 + (uu // 8) % 28, (uu // (8 * 28)) % 32],
                        -1).astype(np.int64)
    coords = np.concatenate([coords_g, coords_u]).astype(np.int32)
    coords = np.unique(coords, axis=0)
    cj = jnp.asarray(coords)
    ts, _ = PK.build_plane_set(cj, GRID, 900)
    t1p = PK.t1p_of(900)
    plan_full = PK.make_plane_plan(ts, t1p, w0=t1p, wy=t1p)
    assert int(plan_full.n_miss) == 0
    plan_w = PK.make_plane_plan(ts, t1p, w0=128, wy=128)
    assert int(plan_w.n_miss) == 0


def test_batched_plan_offsets():
    c, budget = 16, 300
    coords = np.stack([scene(0), scene(1)])
    cj = jnp.asarray(coords)
    ts = jax.vmap(lambda cc: PK.build_plane_set(cc, GRID, budget)[0])(cj)
    t1p = PK.t1p_of(budget)
    plan = PK.make_plane_plan_batched(ts, t1p, w0=t1p, wy=t1p)
    assert plan.ws.shape == (2 * t1p // 128, 3, 2)
    tgt1 = np.asarray(plan.tgt[t1p // 128:])
    real = tgt1[tgt1 < PK.SENTINEL]
    assert (real >= t1p).all() and (real < 2 * t1p).all()


def test_chunk_plane_roundtrip():
    """plane rows <-> chunk planes permutations are mutually inverse on
    active cells (the downsample glue)."""
    # drop-free budgets: GRID has 512 plane keys / 128 tz=4 chunk keys;
    # a dropped plane would legitimately read zero vs the voxel oracle
    c, tz = 8, 4
    coords = scene(4)
    cj = jnp.asarray(coords)
    feats = jnp.asarray(
        np.random.RandomState(3).randn(len(coords), c).astype(np.float32))
    pts, _ = PK.build_plane_set(cj, GRID, 512)
    tts, _ = TC.build_tile_set(cj, GRID, 4, 4, tz, 128)
    t1p = PK.t1p_of(512)
    state, mask = PK.build_plane_state(feats, cj, pts, GRID, t1p)
    # chunk planes built directly from voxels (oracle)
    pslot, _ = TP.row_slots(cj, tts, GRID, 4, 4, tz)
    p_ref = TP.scatter_rows(feats, pslot, tts, tz, 4, 4)

    prank = PK.plane_ranks_of_chunks(tts, pts, GRID, tz, 512)
    p_got = PK.plane_state_to_planes(state, prank, tz)
    np.testing.assert_allclose(np.asarray(p_got).reshape(-1, 16 * c),
                               np.asarray(p_ref).reshape(-1, 16 * c),
                               atol=1e-6)

    crank = PK.chunk_ranks_of_planes(pts, tts, GRID, tz, 128)
    st_got = PK.planes_to_plane_state(p_ref, crank, t1p)
    np.testing.assert_allclose(np.asarray(st_got), np.asarray(state),
                               atol=1e-6)
