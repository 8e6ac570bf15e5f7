"""Parity of the Pallas tile-block kernel (ops/pallas/tile_block_kernel.py
+ ops/tile_kernel.py) against the tile_planes engine (itself pinned to the
gather-GEMM/dense oracle in tests/test_tile_planes.py).

Runs the kernel in interpreter mode on CPU; Mosaic-lowered parity is
exercised on the real chip by tools/microbench.py (tilek) and the flagship
bench.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sparse2dense_tpu.ops import tile_conv as TC
from sparse2dense_tpu.ops import tile_planes as TP
from sparse2dense_tpu.ops import tile_kernel as TK

GRID = (8, 32, 32)


def scene(seed=0, v=500, n_pad=20):
    rng = np.random.RandomState(seed)
    lin = rng.choice(GRID[0] * GRID[1] * GRID[2], v, replace=False)
    z, y, x = lin // (GRID[1] * GRID[2]), (lin // GRID[2]) % GRID[1], \
        lin % GRID[2]
    coords = np.stack([z, y, x], -1).astype(np.int32)
    coords[-n_pad:] = -1
    return coords


def build(coords, tz, c, budget, dtype=jnp.float32, seed=1):
    rng = np.random.RandomState(seed)
    v = len(coords)
    feats = rng.randn(v, c).astype(np.float32)
    feats[np.all(coords < 0, 1)] = 0
    cj, fj = jnp.asarray(coords), jnp.asarray(feats, dtype)
    ts, _ = TC.build_tile_set(cj, GRID, 4, 4, tz, budget)
    t1p = TK.t1p_of(budget)
    state, mask = TK.build_state(fj, cj, ts, GRID, 4, 4, tz, t1p)
    pslot, _ = TP.row_slots(cj, ts, GRID, 4, 4, tz)
    p = TP.scatter_rows(fj, pslot, ts, tz, 4, 4)
    mask_p = TP.build_mask(pslot, ts, tz, 4, 4)
    return ts, t1p, state, mask, p, mask_p


def ref_vs_kernel(tz, c, co, budget=60, relu=False, residual=False,
                  w0=None, wz=None, seed=0):
    coords = scene(seed)
    ts, t1p, state, mask, p, mask_p = build(coords, tz, c, budget, seed=seed)
    rng = np.random.RandomState(seed + 7)
    w = jnp.asarray(rng.randn(27, c, co).astype(np.float32)) * 0.2
    bias = jnp.asarray(rng.randn(co).astype(np.float32))

    y_ref, _ = TP.subm_conv(p, mask_p, ts, tz, w, bias)
    res_p = None
    res_state = None
    if residual:
        assert c == co
        res_p = p
        res_state = TK.expand_mask(mask, 0)  # placeholder, replaced below
        res_state = state
    if relu:
        ref = jnp.maximum(y_ref + (res_p if residual else 0.0), 0.0) \
            * mask_p.astype(y_ref.dtype)
    else:
        ref = y_ref + ((res_p * mask_p) if residual else 0.0)

    exports = TK.make_exports(state, tz, c)
    plan = TK.make_block_plan(ts, t1p, w0=w0 or t1p, wz=wz or t1p)
    scale16, shift16 = TK.fold_epilogue(co, bias=bias)
    mask16 = TK.expand_mask(mask, co)
    out, exports_o = TK.tk_subm_conv(
        state, exports, plan, w, scale16, shift16, mask16,
        residual=res_state if residual else None,
        relu=relu, w0=w0 or t1p, wz=wz or t1p, interpret=True)

    got = TK.state_to_planes(out, tz, co)[: (budget + 1) * tz]
    m = np.asarray(mask_p)[..., 0] > 0
    np.testing.assert_allclose(np.asarray(got)[m], np.asarray(ref)[m],
                               rtol=2e-5, atol=2e-5)
    return out, exports_o, plan


def test_subm_parity_tz4():
    ref_vs_kernel(tz=4, c=16, co=16)


def test_subm_parity_tz2_wide():
    ref_vs_kernel(tz=2, c=32, co=16, budget=100)


def test_subm_parity_relu_residual():
    ref_vs_kernel(tz=4, c=16, co=16, relu=True, residual=True)


def test_exports_match_rebuild():
    tz, c, co = 4, 16, 16
    out, exports_o, _ = ref_vs_kernel(tz=tz, c=c, co=co, seed=3)
    exports_r = TK.make_exports(out, tz, co)
    for ci, (a, b) in enumerate(zip(exports_o, exports_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6,
                                   err_msg=f"cluster {ci}")


def test_chained_convs_via_kernel_exports():
    """Second conv consuming the kernel's own exports == oracle chain."""
    tz, c, budget = 4, 16, 60
    coords = scene(5)
    ts, t1p, state, mask, p, mask_p = build(coords, tz, c, budget, seed=5)
    rng = np.random.RandomState(11)
    w1 = jnp.asarray(rng.randn(27, c, c).astype(np.float32)) * 0.2
    w2 = jnp.asarray(rng.randn(27, c, c).astype(np.float32)) * 0.2

    r1, _ = TP.subm_conv(p, mask_p, ts, tz, w1)
    r1 = jnp.maximum(r1, 0.0) * mask_p.astype(r1.dtype)
    r2, _ = TP.subm_conv(r1, mask_p, ts, tz, w2)

    exports = TK.make_exports(state, tz, c)
    plan = TK.make_block_plan(ts, t1p, w0=t1p, wz=t1p)
    sc1, sh1 = TK.fold_epilogue(c)
    mask16 = TK.expand_mask(mask, c)
    o1, exports_o = TK.tk_subm_conv(
        state, exports, plan, w1, sc1, sh1, mask16, relu=True,
        w0=t1p, wz=t1p, interpret=True)
    o2, _ = TK.tk_subm_conv(
        o1, exports_o, plan, w2, sc1, sh1, mask16, relu=False,
        w0=t1p, wz=t1p, interpret=True)

    got = TK.state_to_planes(o2, tz, c)[: (budget + 1) * tz]
    m = np.asarray(mask_p)[..., 0] > 0
    np.testing.assert_allclose(np.asarray(got)[m], np.asarray(r2)[m],
                               rtol=2e-5, atol=2e-5)


def test_bn_fold_matches_batchnorm():
    co = 8
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(40, co).astype(np.float32))
    bias = jnp.asarray(rng.randn(co).astype(np.float32))
    gamma = jnp.asarray(rng.rand(co).astype(np.float32) + 0.5)
    beta = jnp.asarray(rng.randn(co).astype(np.float32))
    mean = jnp.asarray(rng.randn(co).astype(np.float32))
    var = jnp.asarray(rng.rand(co).astype(np.float32) + 0.1)
    sc, sh = TK.fold_epilogue(co, bias=bias, bn_scale=gamma, bn_bias=beta,
                              bn_mean=mean, bn_var=var, eps=1e-5)
    ref = (x + bias - mean) * gamma * jax.lax.rsqrt(var + 1e-5) + beta
    got = x * sc[0, :co] + sh[0, :co]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5,
                               atol=1e-5)


def test_window_miss_counted_and_dropped():
    """Targets outside the rank window are dropped AND counted."""
    tz, c, budget = 2, 16, 124  # t1p = 128: windows can be < span
    coords = scene(7, v=800, n_pad=10)
    ts, t1p, state, mask, p, mask_p = build(coords, tz, c, budget, seed=7)
    plan_full = TK.make_block_plan(ts, t1p, w0=t1p, wz=t1p)
    plan_tight = TK.make_block_plan(ts, t1p, w0=16, wz=16)
    assert int(plan_full.n_miss) == 0
    assert int(plan_tight.n_miss) > 0
    # dropped targets are sentinels -> kernel contribution is zero, not junk
    w = jnp.asarray(np.random.RandomState(1).randn(27, c, c).astype(
        np.float32)) * 0.2
    exports = TK.make_exports(state, tz, c)
    sc, sh = TK.fold_epilogue(c)
    m16 = TK.expand_mask(mask, c)
    out, _ = TK.tk_subm_conv(state, exports, plan_tight, w, sc, sh,
                             m16, relu=False, w0=16, wz=16, interpret=True)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_batched_plan_offsets():
    tz, c, budget = 2, 16, 60
    coords = np.stack([scene(0), scene(1)])
    cj = jnp.asarray(coords)
    ts = jax.vmap(lambda cc: TC.build_tile_set(cc, GRID, 4, 4, tz, budget)[0]
                  )(cj)
    t1p = TK.t1p_of(budget)
    plan = TK.make_block_plan_batched(ts, t1p, w0=t1p, wz=t1p)
    assert plan.ws.shape == (2 * t1p // 128, 9)
    # second element's targets live in [t1p, 2*t1p)
    tgt1 = np.asarray(plan.tgt[t1p // 128:])
    real = tgt1[tgt1 < TK.SENTINEL]
    assert (real >= t1p).all() and (real < 2 * t1p).all()
