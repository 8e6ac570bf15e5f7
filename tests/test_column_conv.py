"""Column-dense engine vs the gather-GEMM engine: same operator, same
numbers."""
import numpy as np
import jax
import jax.numpy as jnp

from sparse2dense_tpu.ops import sparse_conv as sc
from sparse2dense_tpu.ops import column_conv as cc

GRID = (6, 8, 9)  # (D, H, W)


def _random_sparse(rng, n, cin, budget):
    cells = rng.choice(np.prod(GRID), size=n, replace=False)
    z = cells // (GRID[1] * GRID[2])
    y = (cells // GRID[2]) % GRID[1]
    x = cells % GRID[2]
    coords = np.full((1, budget, 3), -1, np.int32)
    coords[0, :n] = np.stack([z, y, x], 1)
    valid = np.zeros((1, budget), bool)
    valid[0, :n] = True
    feats = np.zeros((1, budget, cin), np.float32)
    feats[0, :n] = rng.randn(n, cin)
    return jnp.asarray(feats), jnp.asarray(coords), jnp.asarray(valid)


def _as_dict(feats, coords, valid):
    out = {}
    c = np.asarray(coords[0])
    f = np.asarray(feats[0])
    for i in np.where(np.asarray(valid[0]))[0]:
        out[tuple(c[i])] = f[i]
    return out


def test_roundtrip_rows_columns(rng):
    feats, coords, valid = _random_sparse(rng, 30, 4, 64)
    cf, cols, cvalid, zm = cc.rows_to_columns(feats, coords, valid, GRID, 64)
    f2, coords2, valid2 = cc.columns_to_rows(cf, cols, cvalid, zm, 64)
    a, b = _as_dict(feats, coords, valid), _as_dict(f2, coords2, valid2)
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_allclose(a[k], b[k])


def test_subm_conv_matches_gather(rng):
    cin, cout, n, budget = 5, 7, 40, 64
    feats, coords, valid = _random_sparse(rng, n, cin, budget)
    w = jnp.asarray(rng.randn(27, cin, cout).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(cout).astype(np.float32) * 0.1)

    # gather engine
    idx = sc.build_index_grid_batched(coords, valid, GRID)
    nbr = sc.subm_neighbor_table_batched(coords, valid, idx, GRID)
    ref = sc.gather_conv_batched(feats, nbr, w, b)
    ref = ref * valid[..., None]
    ref_d = _as_dict(ref, coords, valid)

    # column engine
    cf, cols, cvalid, zm = cc.rows_to_columns(feats, coords, valid, GRID, budget)
    tbl = cc.build_col_table(cols, cvalid, GRID[1:])
    cnbr = cc.col_neighbor_table(cols, cvalid, tbl, GRID[1:])
    out = cc.col_subm_conv(cf, zm, cnbr, w, b)
    f2, coords2, valid2 = cc.columns_to_rows(out, cols, cvalid, zm, budget)
    got_d = _as_dict(f2, coords2, valid2)

    assert set(got_d) == set(ref_d)
    for k in ref_d:
        np.testing.assert_allclose(got_d[k], ref_d[k], rtol=1e-4, atol=1e-5)


def test_strided_conv_matches_gather(rng):
    cin, cout, n, budget = 4, 6, 35, 64
    feats, coords, valid = _random_sparse(rng, n, cin, budget)
    w = jnp.asarray(rng.randn(27, cin, cout).astype(np.float32) * 0.1)
    grid_out = sc.conv_out_grid(GRID, (2, 2, 2), (1, 1, 1), (3, 3, 3))

    # gather engine
    idx = sc.build_index_grid_batched(coords, valid, GRID)
    oc, ov = sc.downsample_active_set_batched(
        coords, valid, GRID, grid_out, (2, 2, 2), (1, 1, 1), (3, 3, 3), budget)
    nbr = sc.downsample_neighbor_table_batched(
        oc, ov, idx, GRID, (2, 2, 2), (1, 1, 1), (3, 3, 3))
    ref = sc.gather_conv_batched(feats, nbr, w) * ov[..., None]
    ref_d = _as_dict(ref, oc, ov)

    # column engine
    cf, cols, cvalid, zm = cc.rows_to_columns(feats, coords, valid, GRID, budget)
    ocols, ovalid = cc.downsample_columns(cols, cvalid, GRID[1:], grid_out[1:],
                                          budget)
    tbl = cc.build_col_table(cols, cvalid, GRID[1:])
    snbr = cc.strided_col_neighbor_table(ocols, ovalid, tbl, GRID[1:])
    d_out = grid_out[0]
    out = cc.col_z_strided_conv(cf, zm, snbr, w, z_pad=1, d_out=d_out)
    new_zm = cc.z_mask_downsample(zm, snbr, z_pad=1, d_out=d_out)
    out = out * new_zm
    f2, coords2, valid2 = cc.columns_to_rows(out, ocols, ovalid, new_zm, budget)
    got_d = _as_dict(f2, coords2, valid2)

    assert set(got_d) == set(ref_d)
    for k in ref_d:
        np.testing.assert_allclose(got_d[k], ref_d[k], rtol=1e-4, atol=1e-5)
