"""Planes-layout tile engine vs the 5D tile_conv oracle (itself pinned to
the gather-GEMM/dense oracle in tests/test_tile_conv.py).

Covers scatter/mask round-trips, subm convs (xy one-hot halo import +
z-edge u import), chained convs, strided downsamples in both z modes,
zconv, dense round-trip, gradients, and the one-hot miss telemetry.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sparse2dense_tpu.ops import tile_conv as TC
from sparse2dense_tpu.ops import tile_planes as TP


def _scene(rng, grid, n, c=8):
    d, h, w = grid
    centers = rng.rand(5, 3) * [d, h, w]
    pts = (centers[rng.randint(0, 5, n * 3)] +
           rng.randn(n * 3, 3) * [1.5, 4, 4]).astype(int)
    ok = ((pts >= 0).all(1) & (pts < [d, h, w]).all(1))
    pts = pts[ok]
    lin = (pts[:, 0] * h + pts[:, 1]) * w + pts[:, 2]
    _, first = np.unique(lin, return_index=True)
    coords = pts[np.sort(first)][:n].astype(np.int32)
    feats = rng.randn(len(coords), c).astype(np.float32)
    return feats, coords


def _pad(feats, coords, budget):
    n = len(coords)
    feats = np.pad(feats, ((0, budget - n), (0, 0)))
    coords = np.pad(coords, ((0, budget - n), (0, 0)), constant_values=-1)
    return jnp.asarray(feats), jnp.asarray(coords)


def _both(feats, coords, grid, ty=4, tx=4, tz=4, budget=160):
    ts, slot5 = TC.build_tile_set(coords, grid, ty, tx, tz, budget)
    buf5 = TC.scatter_rows(feats, slot5, ts, tz, ty, tx)      # oracle state
    mask5 = TC.build_mask(slot5, ts, tz, ty, tx)
    slot, _ = TP.row_slots(coords, ts, grid, ty, tx, tz)
    y = TP.scatter_rows(feats, slot, ts, tz, ty, tx)          # planes state
    maskp = TP.build_mask(slot, ts, tz, ty, tx)
    return ts, slot5, buf5, mask5, slot, y, maskp


def _interior5(y, ts, tz):
    t1 = ts.tile_pos.shape[0] + 1
    return y.reshape((t1, tz) + y.shape[1:])


def test_scatter_and_mask_match_5d(rng):
    grid = (9, 24, 24)
    feats, coords = _scene(rng, grid, 300)
    feats, coords = _pad(feats, coords, 320)
    ts, slot5, buf5, mask5, slot, y, maskp = _both(feats, coords, grid, tz=4)
    np.testing.assert_allclose(
        np.asarray(_interior5(y, ts, 4)),
        np.asarray(buf5[:, 1:5, 1:5, 1:5, :]), rtol=0, atol=0)
    np.testing.assert_array_equal(
        np.asarray(_interior5(maskp, ts, 4)), np.asarray(mask5))
    rows = TP.rows_from_planes(y, slot)
    keep = np.asarray(jnp.all(coords >= 0, axis=-1))
    np.testing.assert_allclose(np.asarray(rows)[keep],
                               np.asarray(feats)[keep], rtol=0, atol=0)


@pytest.mark.parametrize("tz", [4, 2])
def test_subm_chain_matches_5d(rng, tz):
    grid = (8, 20, 20)
    feats, coords = _scene(rng, grid, 260)
    feats, coords = _pad(feats, coords, 288)
    ws = [jnp.asarray(rng.randn(27, 8, 8).astype(np.float32)) * 0.25
          for _ in range(3)]
    ts, slot5, buf5, mask5, slot, y, maskp = _both(feats, coords, grid, tz=tz)

    for w in ws:
        out5 = TC.tile_subm_conv(buf5, mask5, w)
        buf5 = TC.repad(out5, ts)
        y, nmiss = TP.subm_conv(y, maskp, ts, tz, w)
        assert int(nmiss) == 0  # windows cover at this scale
    np.testing.assert_allclose(
        np.asarray(_interior5(y, ts, tz)),
        np.asarray(buf5[:, 1:tz + 1, 1:5, 1:5, :]), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("pz,tz,tz_out", [(1, 4, 2), (0, 4, 2), (1, 4, 8)])
def test_downsample_matches_5d(rng, pz, tz, tz_out):
    grid = (8, 24, 24)
    feats, coords = _scene(rng, grid, 300)
    feats, coords = _pad(feats, coords, 320)
    w = jnp.asarray(rng.randn(27, 8, 12).astype(np.float32)) * 0.2
    ksize, padding = (3, 3, 3), (pz, 1, 1)
    ts, slot5, buf5, mask5, slot, y, maskp = _both(
        feats, coords, grid, tz=tz, budget=128)
    y5, m5, ts5, grid5 = TC.tile_downsample(
        buf5, mask5, ts, grid, w, ksize, padding, tz=tz, tz_out=tz_out,
        budget_out=128)
    yp, mp, tsp, gridp, miss = TP.downsample(
        y, maskp, ts, grid, w, ksize, padding, tz=tz, tz_out=tz_out,
        budget_out=128)
    assert gridp == grid5
    assert int(miss) == 0
    np.testing.assert_array_equal(np.asarray(tsp.tile_pos),
                                  np.asarray(ts5.tile_pos))
    assert int(tsp.n_drop) == int(ts5.n_drop) == 0
    np.testing.assert_allclose(
        np.asarray(_interior5(yp, tsp, tz_out)), np.asarray(y5[:, :tz_out]),
        rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(
        np.asarray(_interior5(mp, tsp, tz_out)), np.asarray(m5))


def test_zconv_and_dense_match_5d(rng):
    grid = (5, 12, 12)
    feats, coords = _scene(rng, grid, 150)
    feats, coords = _pad(feats, coords, 160)
    w = jnp.asarray(rng.randn(3, 8, 16).astype(np.float32)) * 0.2
    ts, slot5, buf5, mask5, slot, y, maskp = _both(feats, coords, grid, tz=6)

    y5, m5 = TC.tile_zconv(buf5, mask5, w, d=grid[0])
    yp, mp = TP.zconv(y, maskp, w, d=grid[0], tz=6)
    np.testing.assert_allclose(np.asarray(yp), np.asarray(y5),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(mp), np.asarray(m5))

    dense5 = TC.tiles_to_dense(buf5[:, 1:7, 1:5, 1:5, :], ts, grid, tz=6)
    densep = TP.to_dense(y, ts, grid, tz=6)
    np.testing.assert_allclose(np.asarray(densep), np.asarray(dense5),
                               rtol=1e-6, atol=1e-6)


def test_grad_matches_5d(rng):
    grid = (6, 12, 12)
    feats, coords = _scene(rng, grid, 120)
    feats, coords = _pad(feats, coords, 128)
    w1 = jnp.asarray(rng.randn(27, 8, 8).astype(np.float32)) * 0.2
    w2 = jnp.asarray(rng.randn(27, 8, 8).astype(np.float32)) * 0.2
    ts, slot5 = TC.build_tile_set(coords, grid, 4, 4, 2, 160)
    mask5 = TC.build_mask(slot5, ts, 2, 4, 4)
    slot, _ = TP.row_slots(coords, ts, grid, 4, 4, 2)
    maskp = TP.build_mask(slot, ts, 2, 4, 4)

    def loss_planes(f, w1, w2):
        y = TP.scatter_rows(f, slot, ts, 2, 4, 4)
        y, _ = TP.subm_conv(y, maskp, ts, 2, w1, compute_dtype=jnp.float32)
        y, _ = TP.subm_conv(y, maskp, ts, 2, w2, compute_dtype=jnp.float32)
        rows = TP.rows_from_planes(y, slot)
        return jnp.sum(rows ** 2)

    def loss_5d(f, w1, w2):
        buf = TC.scatter_rows(f, slot5, ts, 2, 4, 4)
        out = TC.tile_subm_conv(buf, mask5, w1)
        buf = TC.repad(out, ts)
        out = TC.tile_subm_conv(buf, mask5, w2)
        rows = TC.rows_from_tiles(jnp.pad(
            out, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0))), slot5)
        return jnp.sum(rows ** 2)

    gp = jax.grad(loss_planes, argnums=(0, 1, 2))(feats, w1, w2)
    g5 = jax.grad(loss_5d, argnums=(0, 1, 2))(feats, w1, w2)
    for a, b in zip(gp, g5):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3)


def test_miss_telemetry(rng):
    """A too-small one-hot window must be exact anyway (patched) and
    COUNTED."""
    grid = (4, 64, 64)
    feats, coords = _scene(rng, grid, 500)
    feats, coords = _pad(feats, coords, 512)
    ts, _ = TC.build_tile_set(coords, grid, 4, 4, 4, 512)
    slot, _ = TP.row_slots(coords, ts, grid, 4, 4, 4)
    y = TP.scatter_rows(feats, slot, ts, 4, 4, 4)
    maskp = TP.build_mask(slot, ts, 4, 4, 4)
    w = jnp.asarray(rng.randn(27, 8, 8).astype(np.float32)) * 0.2
    y_small, miss_small = TP.subm_conv(y, maskp, ts, 4, w,
                                       compute_dtype=jnp.float32, window=8)
    y_big, miss_big = TP.subm_conv(y, maskp, ts, 4, w,
                                   compute_dtype=jnp.float32, window=256)
    np.testing.assert_allclose(np.asarray(y_small), np.asarray(y_big),
                               rtol=1e-3, atol=1e-3)
    assert int(miss_small) > 0
    assert int(miss_big) == 0
