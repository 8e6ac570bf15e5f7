"""Sparse conv engine vs dense-conv ground truth on tiny grids.

Submanifold conv at active sites equals a dense conv over the zero-filled
grid evaluated at those sites (inactive neighbors contribute zero), so
lax.conv on the densified tensor is an exact oracle.
"""
import numpy as np
import jax
import jax.numpy as jnp

from sparse2dense_tpu.ops.sparse_conv import (
    build_index_grid,
    subm_neighbor_table,
    downsample_active_set,
    downsample_neighbor_table,
    gather_conv,
    scatter_to_dense,
    ravel_coords,
)

GRID = (5, 6, 7)


def _random_sparse(rng, n_active, cin, budget):
    cells = rng.choice(np.prod(GRID), size=n_active, replace=False)
    z = cells // (GRID[1] * GRID[2])
    y = (cells // GRID[2]) % GRID[1]
    x = cells % GRID[2]
    coords = np.full((budget, 3), -1, np.int32)
    coords[:n_active] = np.stack([z, y, x], 1)
    valid = np.zeros(budget, bool)
    valid[:n_active] = True
    feats = np.zeros((budget, cin), np.float32)
    feats[:n_active] = rng.randn(n_active, cin).astype(np.float32)
    return jnp.asarray(coords), jnp.asarray(valid), jnp.asarray(feats)


def _dense_conv(feats, coords, valid, w, stride=(1, 1, 1), padding=(1, 1, 1)):
    """Oracle: lax 3D conv over the densified grid, NDHWC."""
    dense = np.zeros(GRID + (feats.shape[-1],), np.float32)
    c = np.asarray(coords)
    v = np.asarray(valid)
    dense[c[v, 0], c[v, 1], c[v, 2]] = np.asarray(feats)[v]
    k = w.shape[0]
    kz = round(k ** (1 / 3))
    wk = np.asarray(w).reshape(kz, kz, kz, w.shape[1], w.shape[2])
    out = jax.lax.conv_general_dilated(
        jnp.asarray(dense)[None], jnp.asarray(wk),
        window_strides=stride, padding=[(p, p) for p in padding],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )[0]
    return np.asarray(out)


def test_subm_conv_matches_dense(rng):
    cin, cout, budget, n = 4, 8, 32, 20
    coords, valid, feats = _random_sparse(rng, n, cin, budget)
    w = jnp.asarray(rng.randn(27, cin, cout).astype(np.float32) * 0.1)

    grid_idx = build_index_grid(coords, valid, GRID)
    nbr = subm_neighbor_table(coords, valid, grid_idx, GRID)
    out = gather_conv(feats, nbr, w)

    oracle = _dense_conv(feats, coords, valid, w)
    c = np.asarray(coords)
    for i in range(n):
        np.testing.assert_allclose(
            np.asarray(out)[i], oracle[c[i, 0], c[i, 1], c[i, 2]], rtol=1e-4, atol=1e-5
        )
    # padded rows produce zeros
    np.testing.assert_allclose(np.asarray(out)[n:], 0.0, atol=1e-6)


def test_downsample_set_and_values(rng):
    cin, cout, budget, n = 3, 5, 32, 18
    coords, valid, feats = _random_sparse(rng, n, cin, budget)
    w = jnp.asarray(rng.randn(27, cin, cout).astype(np.float32) * 0.1)
    stride, pad, k = (2, 2, 2), (1, 1, 1), (3, 3, 3)
    grid_out = tuple((np.array(GRID) + 2 * np.array(pad) - 3) // 2 + 1)

    # expected active set by brute force
    expect = set()
    c = np.asarray(coords)
    for i in range(n):
        for kz in range(3):
            for ky in range(3):
                for kx in range(3):
                    num = c[i] + np.array(pad) - np.array([kz, ky, kx])
                    if np.all(num % 2 == 0):
                        o = num // 2
                        if np.all(o >= 0) and np.all(o < grid_out):
                            expect.add(tuple(o))

    out_coords, out_valid = downsample_active_set(
        coords, valid, GRID, grid_out, stride, pad, k, out_budget=64
    )
    got = {tuple(r) for r in np.asarray(out_coords)[np.asarray(out_valid)]}
    assert got == expect

    # values match dense strided conv at active outputs
    grid_idx = build_index_grid(coords, valid, GRID)
    nbr = downsample_neighbor_table(out_coords, out_valid, grid_idx, GRID, stride, pad, k)
    out = gather_conv(feats, nbr, w)
    oracle = _dense_conv(feats, coords, valid, w, stride=stride, padding=pad)
    oc = np.asarray(out_coords)
    for i in np.where(np.asarray(out_valid))[0]:
        np.testing.assert_allclose(
            np.asarray(out)[i], oracle[oc[i, 0], oc[i, 1], oc[i, 2]], rtol=1e-4, atol=1e-5
        )


def test_budget_overflow_drops_deterministically(rng):
    coords, valid, feats = _random_sparse(rng, 20, 2, 32)
    grid_out = (3, 3, 4)
    out_coords, out_valid = downsample_active_set(
        coords, valid, GRID, grid_out, (2, 2, 2), (1, 1, 1), (3, 3, 3), out_budget=4
    )
    assert int(out_valid.sum()) <= 4
    # kept cells are the lowest-linear-index ones
    lin = np.asarray(ravel_coords(out_coords, grid_out))[np.asarray(out_valid)]
    assert (np.sort(lin) == lin).all()


def test_scatter_to_dense(rng):
    coords, valid, feats = _random_sparse(rng, 10, 4, 16)
    dense = scatter_to_dense(feats, coords, valid, GRID)
    c = np.asarray(coords)
    for i in range(10):
        np.testing.assert_allclose(
            np.asarray(dense)[c[i, 0], c[i, 1], c[i, 2]], np.asarray(feats)[i]
        )
    assert float(jnp.abs(dense).sum()) > 0
    # total mass conserved
    np.testing.assert_allclose(
        float(dense.sum()), float((feats * valid[:, None]).sum()), rtol=1e-5
    )
