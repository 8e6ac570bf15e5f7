"""Parity of the active-plane Pallas kernel (ops/pallas/plane_block_kernel
+ ops/plane_conv) against the tile_planes engine at tz=1 (itself pinned to
the gather-GEMM/dense oracle in tests/test_tile_planes.py).

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
    pslot, _ = TP.row_slots(cj, ts, GRID, 4, 4, 1)
    p = TP.scatter_rows(fj, pslot, ts, 1, 4, 4)
    mask_p = TP.build_mask(pslot, ts, 1, 4, 4)
    return ts, t1p, state, mask, p, mask_p


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


def ref_vs_kernel(c, co, budget=512, relu=False, residual=False,
                  w0=None, wz=None, seed=0):
    coords = scene(seed)
    ts, t1p, state, mask, p, mask_p = build(coords, c, budget, seed=seed)
    rng = np.random.RandomState(seed + 7)
    w = jnp.asarray(rng.randn(27, c, co).astype(np.float32)) * 0.2
    bias = jnp.asarray(rng.randn(co).astype(np.float32))
    # the same feats build() made (same seed)
    feats_rows = np.random.RandomState(seed).randn(len(coords), c) \
        .astype(np.float32)
    feats_rows[np.all(coords < 0, 1)] = 0

    y_rows = dense_subm_oracle(coords, feats_rows, np.asarray(w),
                               np.asarray(bias))
    # scatter oracle rows into the planes layout for masked comparison
    pslot, _ = TP.row_slots(jnp.asarray(coords), ts, GRID, 4, 4, 1)
    y_ref = TP.scatter_rows(jnp.asarray(y_rows), pslot, ts, 1, 4, 4)
    if relu:
        ref = jnp.maximum(y_ref + (p if residual else 0.0), 0.0) \
            * mask_p.astype(y_ref.dtype)
    else:
        ref = y_ref + ((p * mask_p) if residual else 0.0)

    exports = PK.make_plane_exports(state, c)
    plan = PK.make_plane_plan(ts, t1p, w0=w0 or t1p, wz=wz or t1p)
    scale16, shift16 = PK.fold_epilogue(co, bias=bias)
    mask16 = PK.expand_mask(mask, co)
    out, exports_o = PK.pk_subm_conv(
        state, exports, plan, w, scale16, shift16, mask16,
        residual=state if residual else None,
        relu=relu, w0=w0 or t1p, wz=wz or t1p, interpret=True)

    got = out[: budget + 1].reshape(-1, 4, 4, co)
    m = np.asarray(mask_p)[..., 0] > 0
    np.testing.assert_allclose(np.asarray(got)[m], np.asarray(ref)[m],
                               rtol=2e-5, atol=2e-5)
    return out, exports_o, plan


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


def test_exports_match_rebuild():
    out, exports_o, _ = ref_vs_kernel(c=16, co=16, seed=3)
    exports_r = PK.make_plane_exports(out, 16)
    for ci, (a, b) in enumerate(zip(exports_o, exports_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6,
                                   err_msg=f"cluster {ci}")


def test_chained_convs_via_kernel_exports():
    c, budget = 16, 512
    coords = scene(5)
    ts, t1p, state, mask, p, mask_p = build(coords, c, budget, seed=5)
    rng = np.random.RandomState(11)
    w1 = jnp.asarray(rng.randn(27, c, c).astype(np.float32)) * 0.2
    w2 = jnp.asarray(rng.randn(27, c, c).astype(np.float32)) * 0.2

    feats_rows = np.random.RandomState(5).randn(len(coords), c) \
        .astype(np.float32)
    feats_rows[np.all(coords < 0, 1)] = 0
    r1_rows = np.maximum(dense_subm_oracle(coords, feats_rows,
                                           np.asarray(w1)), 0.0)
    r2_rows = dense_subm_oracle(coords, r1_rows, np.asarray(w2))
    pslot, _ = TP.row_slots(jnp.asarray(coords), ts, GRID, 4, 4, 1)
    r2 = TP.scatter_rows(jnp.asarray(r2_rows), pslot, ts, 1, 4, 4)

    exports = PK.make_plane_exports(state, c)
    plan = PK.make_plane_plan(ts, t1p, w0=t1p, wz=t1p)
    sc1, sh1 = PK.fold_epilogue(c)
    mask16 = PK.expand_mask(mask, c)
    o1, exports_o = PK.pk_subm_conv(
        state, exports, plan, w1, sc1, sh1, mask16, relu=True,
        w0=t1p, wz=t1p, interpret=True)
    o2, _ = PK.pk_subm_conv(
        o1, exports_o, plan, w2, sc1, sh1, mask16, relu=False,
        w0=t1p, wz=t1p, interpret=True)

    got = o2[: budget + 1].reshape(-1, 4, 4, c)
    m = np.asarray(mask_p)[..., 0] > 0
    np.testing.assert_allclose(np.asarray(got)[m], np.asarray(r2)[m],
                               rtol=2e-5, atol=2e-5)


def test_two_range_windows_cover_boundary_blocks():
    """Tight single ranges miss z-boundary blocks; the second range
    covers them (miss -> 0) on a scene with uneven layer densities."""
    rng = np.random.RandomState(9)
    # dense ground layer + sparse upper layers = bimodal z-neighbor ranks
    n_g, n_u = 600, 120
    gy = rng.choice(32 * 32, n_g, replace=False)
    coords_g = np.stack([np.zeros(n_g, np.int64), gy // 32, gy % 32], -1)
    uy = rng.choice(7 * 32 * 32, n_u, replace=False)
    coords_u = np.stack([1 + uy // (32 * 32), (uy // 32) % 32, uy % 32], -1)
    coords = np.concatenate([coords_g, coords_u]).astype(np.int32)
    coords = np.unique(coords, axis=0)
    cj = jnp.asarray(coords)
    ts, _ = PK.build_plane_set(cj, GRID, 900)
    t1p = PK.t1p_of(900)
    plan_w = PK.make_plane_plan(ts, t1p, w0=128, wz=128)
    # single-range equivalent: kernel range 1 duplicated -> count misses
    # the one-range way by rebuilding with wz = t1p for comparison
    plan_full = PK.make_plane_plan(ts, t1p, w0=t1p, wz=t1p)
    assert int(plan_full.n_miss) == 0
    # two 128-ranges must cover far better than one 256-range could:
    # every target is in SOME range here (layer spans < 128 after split)
    assert int(plan_w.n_miss) == 0


def test_batched_plan_offsets():
    c, budget = 16, 300
    coords = np.stack([scene(0), scene(1)])
    cj = jnp.asarray(coords)
    ts = jax.vmap(lambda cc: PK.build_plane_set(cc, GRID, budget)[0])(cj)
    t1p = PK.t1p_of(budget)
    plan = PK.make_plane_plan_batched(ts, t1p, w0=t1p, wz=t1p)
    assert plan.ws.shape == (2 * t1p // 128, 9, 2)
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
