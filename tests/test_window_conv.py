"""Windowed one-hot sparse-conv engine vs the gather-GEMM oracle.

The gather engine (ops/sparse_conv.py) is itself parity-tested against dense
convs (tests/test_sparse_conv.py), so agreement here chains to the dense
oracle. Cases stress the residual path by shrinking the window until block
coverage fails.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sparse2dense_tpu.ops.sparse_conv import (
    build_index_grid,
    gather_conv,
    subm_neighbor_table,
)
from sparse2dense_tpu.ops.window_conv import (
    make_subm_plan,
    taps_zyx_to_dyx,
    window_conv_reference,
)


def _scene(rng, grid, n):
    d, h, w = grid
    lin = rng.choice(d * h * w, size=n, replace=False)
    z, rem = lin // (h * w), lin % (h * w)
    y, x = rem // w, rem % w
    coords = np.stack([z, y, x], -1).astype(np.int32)
    feats = rng.randn(n, 8).astype(np.float32)
    return feats, coords


def _clustered_scene(rng, grid, n):
    """Points clustered in a few blobs (more realistic occupancy)."""
    d, h, w = grid
    centers = rng.rand(6, 3) * [d, h, w]
    pts = (centers[rng.randint(0, 6, n * 3)] +
           rng.randn(n * 3, 3) * [2, 4, 4]).astype(int)
    ok = ((pts >= 0).all(1) & (pts < [d, h, w]).all(1))
    pts = pts[ok]
    lin = (pts[:, 0] * h + pts[:, 1]) * w + pts[:, 2]
    _, first = np.unique(lin, return_index=True)
    pts = pts[np.sort(first)][:n]
    coords = pts.astype(np.int32)
    feats = rng.randn(len(coords), 8).astype(np.float32)
    return feats, coords


def _pad(feats, coords, budget):
    n = len(coords)
    feats = np.pad(feats, ((0, budget - n), (0, 0)))
    coords = np.pad(coords, ((0, budget - n), (0, 0)), constant_values=-1)
    return feats, coords


@pytest.mark.parametrize("scene,block,window", [
    ("uniform", 32, 128),
    ("clustered", 32, 128),
    ("clustered", 16, 48),   # tight window -> residual coverage checks
    ("uniform", 16, 16),     # pathological window -> heavy residual traffic
])
def test_subm_window_matches_gather(rng, scene, block, window):
    grid = (8, 24, 24)
    make = _scene if scene == "uniform" else _clustered_scene
    feats, coords = make(rng, grid, 300)
    feats, coords = _pad(feats, coords, 384)
    weights = rng.randn(27, 8, 6).astype(np.float32) * 0.2
    bias = rng.randn(6).astype(np.float32)

    fj, cj = jnp.asarray(feats), jnp.asarray(coords)
    valid = jnp.all(cj >= 0, axis=-1)

    # oracle: gather engine (z-major tap order)
    table = build_index_grid(cj, valid, grid)
    nbr = subm_neighbor_table(cj, valid, table, grid)
    want = np.asarray(gather_conv(fj * valid[:, None], nbr,
                                  jnp.asarray(weights), jnp.asarray(bias)))
    want = want * np.asarray(valid)[:, None]

    # windowed engine (rows re-sorted; compare as sets keyed by coords)
    sf, sc, plan = make_subm_plan(fj * valid[:, None], cj, grid,
                                  block=block, window=window,
                                  resid_budget=512)
    got = np.asarray(window_conv_reference(
        sf, plan, taps_zyx_to_dyx(jnp.asarray(weights)), jnp.asarray(bias)))
    got = got * np.asarray(plan.out_lin < 2 ** 30)[:, None]
    assert int(plan.n_resid) <= 512

    def keyed(c, o):
        d = {}
        for i in range(len(c)):
            if (c[i] >= 0).all():
                d[tuple(int(v) for v in c[i])] = o[i]
        return d

    a, b = keyed(np.asarray(sc), got), keyed(coords, want)
    assert a.keys() == b.keys()
    for k in a:
        np.testing.assert_allclose(a[k], b[k], rtol=1e-4, atol=1e-4)


def test_backbone_window_engine_matches_gather(rng):
    """Full SpMiddleResNetFHD: engine='window' must equal engine='gather'
    (all-sparse, dense_from_stage off) with the SAME parameters."""
    from sparse2dense_tpu.models.backbones.scn import SpMiddleResNetFHD

    grid = (41, 32, 32)  # real Waymo z-depth so all four z-downsamples exist
    feats, coords = _clustered_scene(rng, grid, 280)
    feats = feats[:, :5]
    feats, coords = _pad(feats, coords, 320)
    fb, cb = jnp.asarray(feats)[None], jnp.asarray(coords)[None]

    # generous stage budgets: on overflow the engines drop cells in different
    # (but each deterministic) orders — zyx-lin vs yxz-lin (documented)
    budgets = (960, 960, 960, 960)
    ref_bb = SpMiddleResNetFHD(num_input_features=5, sparse_shape=grid,
                               dense_from_stage=99, engine="gather",
                               stage_budgets=budgets)
    win_bb = SpMiddleResNetFHD(num_input_features=5, sparse_shape=grid,
                               engine="window", stage_budgets=budgets)
    variables = ref_bb.init(jax.random.PRNGKey(0), fb, cb, False)
    bev_ref, _ = ref_bb.apply(variables, fb, cb, False)
    bev_win, _ = win_bb.apply(variables, fb, cb, False)
    np.testing.assert_allclose(np.asarray(bev_win), np.asarray(bev_ref),
                               rtol=2e-3, atol=2e-4)


def test_second_backbone_window_engine_matches_gather(rng):
    from sparse2dense_tpu.models.backbones.scn import SpMiddleFHD

    grid = (41, 32, 32)
    feats, coords = _clustered_scene(rng, grid, 280)
    feats = feats[:, :5]
    feats, coords = _pad(feats, coords, 320)
    fb, cb = jnp.asarray(feats)[None], jnp.asarray(coords)[None]
    budgets = (960, 960, 960, 960)
    ref_bb = SpMiddleFHD(num_input_features=5, sparse_shape=grid,
                         dense_from_stage=99, engine="gather",
                         stage_budgets=budgets)
    win_bb = SpMiddleFHD(num_input_features=5, sparse_shape=grid,
                         engine="window", stage_budgets=budgets)
    variables = ref_bb.init(jax.random.PRNGKey(0), fb, cb, False)
    bev_ref, _ = ref_bb.apply(variables, fb, cb, False)
    bev_win, _ = win_bb.apply(variables, fb, cb, False)
    np.testing.assert_allclose(np.asarray(bev_win), np.asarray(bev_ref),
                               rtol=2e-3, atol=2e-4)


def test_second_backbone_window_dfs1_matches_gather(rng):
    """The shipped SECOND zoo setting: engine='window' with
    dense_from_stage=1 (window subm0, masked-dense from down1 on) must
    equal the all-sparse gather engine with the SAME parameters."""
    from sparse2dense_tpu.models.backbones.scn import SpMiddleFHD

    grid = (41, 32, 32)
    feats, coords = _clustered_scene(rng, grid, 280)
    feats = feats[:, :5]
    feats, coords = _pad(feats, coords, 320)
    fb, cb = jnp.asarray(feats)[None], jnp.asarray(coords)[None]
    budgets = (960, 960, 960, 960)
    ref_bb = SpMiddleFHD(num_input_features=5, sparse_shape=grid,
                         dense_from_stage=99, engine="gather",
                         stage_budgets=budgets)
    win_bb = SpMiddleFHD(num_input_features=5, sparse_shape=grid,
                         engine="window", dense_from_stage=1,
                         stage_budgets=budgets)
    variables = ref_bb.init(jax.random.PRNGKey(0), fb, cb, False)
    bev_ref, _ = ref_bb.apply(variables, fb, cb, False)
    bev_win, _ = win_bb.apply(variables, fb, cb, False)
    np.testing.assert_allclose(np.asarray(bev_win), np.asarray(bev_ref),
                               rtol=2e-3, atol=2e-4)


def test_kd_voxelnet_window_engine_eval(rng):
    """The bench path: KD_VoxelNet (S2D_RPN student) with engine='window',
    eval forward + predict at tiny scale."""
    import jax.numpy as jnp
    from sparse2dense_tpu.utils import Config
    from sparse2dense_tpu.models import build_detector
    from sparse2dense_tpu.training.synthetic import make_batch

    cfg = Config.fromfile("configs/tests/distill_tiny.py")
    cfg.S_model["backbone"]["engine"] = "window"
    model = build_detector(cfg.S_model, test_cfg=cfg.test_cfg,
                           voxel_generator=cfg.get("voxel_generator"))
    batch = make_batch(cfg, 1, max_voxels=256, n_points=800, n_obj=3,
                       with_targets=False)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    preds = model.apply(variables, batch, train=False)
    out = model.predict(preds, cfg.test_cfg)
    assert np.isfinite(np.asarray(out["scores"])).all()


def test_residual_actually_fires(rng):
    """With a tiny window the plan must route rows through the residual path
    (otherwise the tight-window case above proves nothing)."""
    grid = (8, 24, 24)
    feats, coords = _clustered_scene(rng, grid, 300)
    feats, coords = _pad(feats, coords, 384)
    fj, cj = jnp.asarray(feats), jnp.asarray(coords)
    valid = jnp.all(cj >= 0, axis=-1)
    _, _, plan = make_subm_plan(fj * valid[:, None], cj, grid,
                                block=16, window=16, resid_budget=512)
    assert int(plan.n_resid) > 0


def test_grad_matches_gather(rng):
    """jax.grad through the window engine (custom_vjp: fast forward,
    reference-vjp backward — VERDICT r2 #2) equals grad through the
    gather engine."""
    from sparse2dense_tpu.ops.sparse_conv import (
        build_index_grid, gather_conv, subm_neighbor_table)
    from sparse2dense_tpu.ops import window_conv as WC

    grid = (6, 20, 20)
    d, h, w_ = grid
    lin = rng.choice(d * h * w_, size=250, replace=False)
    z, rem = lin // (h * w_), lin % (h * w_)
    coords = np.stack([z, rem // w_, rem % w_], -1).astype(np.int32)
    feats = rng.randn(250, 8).astype(np.float32)
    feats = np.pad(feats, ((0, 6), (0, 0)))
    coords = np.pad(coords, ((0, 6), (0, 0)), constant_values=-1)
    fj, cj = jnp.asarray(feats), jnp.asarray(coords)
    w = jnp.asarray(rng.randn(27, 8, 8).astype(np.float32)) * 0.2

    fj_s, cj_s, linj = WC.sort_rows(fj, cj, grid)
    plan = WC.make_subm_plan_presorted(linj, cj_s, grid, window=128,
                                       resid_budget=256)
    wd = WC.taps_zyx_to_dyx(w)

    valid = jnp.all(cj_s >= 0, axis=-1)

    # both engines CONTRACT that padded rows are zero (enforced upstream
    # by SparseTensor.masked() / the readers); apply the mask inside the
    # loss so the comparison covers only contract-valid inputs
    def loss_window(f, wd):
        out = WC.window_conv(f * valid[:, None], plan, wd)
        return jnp.sum(out ** 2)

    idx = build_index_grid(cj_s, valid, grid)
    nbr = subm_neighbor_table(cj_s, valid, idx, grid)

    def loss_gather(f, w):
        out = gather_conv(f * valid[:, None], nbr, w) * valid[:, None]
        return jnp.sum(out ** 2)

    gw = jax.grad(loss_window, argnums=(0, 1))(fj_s, wd)
    gg = jax.grad(loss_gather, argnums=(0, 1))(fj_s, w)
    np.testing.assert_allclose(np.asarray(gw[0]), np.asarray(gg[0]),
                               rtol=1e-4, atol=1e-4)
    # weight grads come back in (dy,dx,dz) tap order; dL/dw = dL/dwd
    # indexed by the inverse of the zyx->dyx permutation
    perm = np.asarray(WC.taps_zyx_to_dyx(
        jnp.arange(27, dtype=jnp.float32)[:, None, None]))[:, 0, 0].astype(int)
    inv = np.empty(27, int)
    inv[perm] = np.arange(27)
    gw_w = np.asarray(gw[1])[inv]
    np.testing.assert_allclose(gw_w, np.asarray(gg[1]), rtol=1e-4, atol=1e-4)
