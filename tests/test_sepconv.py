"""Separable-matching sparse-conv engine vs the gather-GEMM oracle.

The gather engine is dense-conv-pinned in tests/test_sparse_conv.py, so
agreement here chains to the dense oracle. Also pins jax.grad parity —
the sep engine is the trainable fast path (VERDICT r2 item 2).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sparse2dense_tpu.ops.sparse_conv import (
    build_index_grid,
    conv_out_grid,
    downsample_neighbor_table,
    gather_conv,
    subm_neighbor_table,
)
from sparse2dense_tpu.ops.sepconv import (
    make_strided_plan_sep,
    make_subm_plan_sep,
    strided_conv_sep,
    subm_conv_sep,
)
from sparse2dense_tpu.ops.window_conv import (
    MISS,
    downsample_active_set_yxz,
    sort_rows,
    yxz_lin,
)


def _scene(rng, grid, n, c=8, clustered=False):
    d, h, w = grid
    if clustered:
        centers = rng.rand(6, 3) * [d, h, w]
        pts = (centers[rng.randint(0, 6, n * 3)] +
               rng.randn(n * 3, 3) * [2, 4, 4]).astype(int)
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


def _oracle_subm(feats, coords, grid, w):
    valid = jnp.all(coords >= 0, axis=-1)
    idx = build_index_grid(coords, valid, grid)
    nbr = subm_neighbor_table(coords, valid, idx, grid)
    return gather_conv(feats, nbr, w)


@pytest.mark.parametrize("clustered,pad", [(False, 0), (True, 37)])
def test_subm_matches_gather(rng, clustered, pad):
    grid = (9, 24, 24)
    feats, coords = _scene(rng, grid, 300, clustered=clustered)
    feats, coords = _pad(feats, coords, len(coords) + pad)
    w = jnp.asarray(rng.randn(27, 8, 12).astype(np.float32)) * 0.2

    ref = _oracle_subm(feats, coords, grid, w)

    sf, sc, lin = sort_rows(feats, coords, grid)
    plan = make_subm_plan_sep(lin, sc, grid)
    out = subm_conv_sep(sf, plan, w, impl="xla")

    # compare in sorted order
    order = jnp.argsort(yxz_lin(coords, grid), stable=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref[order]),
                               rtol=1e-5, atol=1e-5)


def test_subm_bias_and_chain(rng):
    """Two chained convs + bias (residual-block shape)."""
    grid = (7, 16, 16)
    feats, coords = _scene(rng, grid, 180, clustered=True)
    feats, coords = _pad(feats, coords, 200)
    w1 = jnp.asarray(rng.randn(27, 8, 8).astype(np.float32)) * 0.2
    w2 = jnp.asarray(rng.randn(27, 8, 8).astype(np.float32)) * 0.2
    b1 = jnp.asarray(rng.randn(8).astype(np.float32))

    valid = jnp.all(coords >= 0, axis=-1)
    idx = build_index_grid(coords, valid, grid)
    nbr = subm_neighbor_table(coords, valid, idx, grid)
    r = gather_conv(feats, nbr, w1, b1) * valid[:, None]
    ref = gather_conv(r, nbr, w2)

    sf, sc, lin = sort_rows(feats, coords, grid)
    plan = make_subm_plan_sep(lin, sc, grid)
    o = subm_conv_sep(sf, plan, w1, b1, impl="xla")
    out = subm_conv_sep(o, plan, w2, impl="xla")

    order = jnp.argsort(yxz_lin(coords, grid), stable=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref[order]),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("stride,padding,ksize", [
    ((2, 2, 2), (1, 1, 1), (3, 3, 3)),
    ((2, 2, 2), (0, 1, 1), (3, 3, 3)),
    ((2, 1, 1), (0, 0, 0), (3, 1, 1)),
])
def test_strided_matches_gather(rng, stride, padding, ksize):
    grid = (9, 24, 24)
    feats, coords = _scene(rng, grid, 320, clustered=True)
    feats, coords = _pad(feats, coords, 352)
    k = int(np.prod(ksize))
    w = jnp.asarray(rng.randn(k, 8, 12).astype(np.float32)) * 0.2
    grid_out = conv_out_grid(grid, stride, padding, ksize)

    sf, sc, lin = sort_rows(feats, coords, grid)
    valid_in = jnp.all(sc >= 0, axis=-1)
    oc, ol = downsample_active_set_yxz(sc, valid_in, grid, grid_out, stride,
                                       padding, ksize, 400)
    plan = make_strided_plan_sep(lin, ol, oc, grid, stride, padding, ksize)
    out = strided_conv_sep(sf, plan, w, ksize=ksize)

    # oracle on the same (sorted) output set
    valid = jnp.all(coords >= 0, axis=-1)
    idx = build_index_grid(coords, valid, grid)
    ov = ol < MISS
    nbr = downsample_neighbor_table(oc, ov, idx, grid, stride, padding, ksize)
    ref = gather_conv(feats, nbr, w) * ov[:, None]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_grad_matches_gather(rng):
    """jax.grad through the sep engine equals grad through the gather
    engine — the sep engine is the trainable fast path (no custom_vjp
    needed; it is built from differentiable XLA ops)."""
    grid = (7, 12, 12)
    feats, coords = _scene(rng, grid, 120, clustered=True)
    feats, coords = _pad(feats, coords, 128)
    w = jnp.asarray(rng.randn(27, 8, 8).astype(np.float32)) * 0.2
    valid = jnp.all(coords >= 0, axis=-1)
    order = jnp.argsort(yxz_lin(coords, grid), stable=True)
    sf, sc, lin = sort_rows(feats, coords, grid)
    plan = make_subm_plan_sep(lin, sc, grid)

    def loss_sep(f, w):
        out = subm_conv_sep(f[order], plan, w, impl="xla")
        return jnp.sum(out ** 2)

    def loss_gather(f, w):
        idx = build_index_grid(coords, valid, grid)
        nbr = subm_neighbor_table(coords, valid, idx, grid)
        out = gather_conv(f, nbr, w) * valid[:, None]
        return jnp.sum(out ** 2)

    gf_s, gw_s = jax.grad(loss_sep, argnums=(0, 1))(feats, w)
    gf_g, gw_g = jax.grad(loss_gather, argnums=(0, 1))(feats, w)
    np.testing.assert_allclose(np.asarray(gf_s), np.asarray(gf_g),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_s), np.asarray(gw_g),
                               rtol=1e-4, atol=1e-4)
