"""SpMiddleResNetFHD: active-plane Pallas engine ("plane") vs the gather
engine — same params, same inputs, same BEV output, matching grads.
Interpreter-mode kernel on CPU; on-chip numbers live in PERF.md.

Budgets are drop-free so the gather oracle (which sees every voxel) and
the plane engine (which drops only over-budget planes) agree exactly.
"""
import numpy as np
import jax
import jax.numpy as jnp

from sparse2dense_tpu.models.backbones.scn import SpMiddleResNetFHD

GRID = (41, 64, 64)


def scene(seed=0, v=600, b=2):
    rng = np.random.RandomState(seed)
    out_c, out_f = [], []
    for e in range(b):
        lin = rng.choice(GRID[0] * GRID[1] * GRID[2], v, replace=False)
        z = lin // (GRID[1] * GRID[2])
        y = (lin // GRID[2]) % GRID[1]
        x = lin % GRID[2]
        coords = np.stack([z, y, x], -1).astype(np.int32)
        coords[-30:] = -1
        feats = rng.randn(v, 5).astype(np.float32)
        feats[-30:] = 0
        out_c.append(coords)
        out_f.append(feats)
    return jnp.asarray(np.stack(out_f)), jnp.asarray(np.stack(out_c))


def make(engine):
    return SpMiddleResNetFHD(
        num_input_features=5, sparse_shape=GRID, engine=engine,
        dense_from_stage=99, stage_budgets=(4000, 3000, 2000, 2000),
        tile_tz=(8, 4, 2, 6), tile_budgets=(800, 700, 500, 300),
        plane_budgets=(1500, 800, 300), plane_window=10 ** 6,
        win_window=10 ** 6)


def test_plane_matches_gather_eval():
    feats, coords = scene()
    ref_bb = make("gather")
    variables = ref_bb.init(jax.random.PRNGKey(0), feats, coords, False)
    bev_ref, _ = ref_bb.apply(variables, feats, coords, False)

    bev_p, _ = make("plane").apply(variables, feats, coords, False)
    assert bev_p.shape == bev_ref.shape
    np.testing.assert_allclose(np.asarray(bev_p), np.asarray(bev_ref),
                               rtol=1e-4, atol=1e-4)


def test_plane_init_tree_matches_gather():
    feats, coords = scene(1)
    v_ref = make("gather").init(jax.random.PRNGKey(0), feats, coords, False)
    v_p = make("plane").init(jax.random.PRNGKey(0), feats, coords, False)
    for coll in ("params", "batch_stats"):
        assert (jax.tree_util.tree_structure(v_ref[coll])
                == jax.tree_util.tree_structure(v_p[coll])), coll
        for (pa, a), (pb, b2) in zip(
                jax.tree_util.tree_leaves_with_path(v_ref[coll]),
                jax.tree_util.tree_leaves_with_path(v_p[coll])):
            assert a.shape == b2.shape, (pa, a.shape, b2.shape)


def test_plane_train_forward_and_stats_match_gather():
    """train=True: the unfolded-BN path — BEV and the updated running
    statistics must match the gather engine's masked BatchNorm."""
    feats, coords = scene(2, v=400, b=1)
    ref_bb = make("gather")
    variables = ref_bb.init(jax.random.PRNGKey(1), feats, coords, False)
    bev_ref, st_ref = ref_bb.apply(variables, feats, coords, True,
                                   mutable=["batch_stats", "telemetry"])
    bev_ref = bev_ref[0]
    bev_p, st_p = make("plane").apply(variables, feats, coords, True,
                                      mutable=["batch_stats", "telemetry"])
    bev_p = bev_p[0]
    np.testing.assert_allclose(np.asarray(bev_p), np.asarray(bev_ref),
                               rtol=2e-4, atol=2e-4)
    for (pa, a), (pb, b2) in zip(
            jax.tree_util.tree_leaves_with_path(st_ref["batch_stats"]),
            jax.tree_util.tree_leaves_with_path(st_p["batch_stats"])):
        np.testing.assert_allclose(np.asarray(b2), np.asarray(a),
                                   rtol=2e-4, atol=2e-4, err_msg=str(pa))


def test_plane_grads_match_gather():
    feats, coords = scene(3, v=300, b=1)
    ref_bb = make("gather")
    variables = ref_bb.init(jax.random.PRNGKey(2), feats, coords, False)

    def loss(params, bb):
        (bev, _), _ = bb.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            feats, coords, True, mutable=["batch_stats", "telemetry"])
        return jnp.sum(bev ** 2)

    g_ref = jax.grad(loss)(variables["params"], ref_bb)
    g_p = jax.grad(loss)(variables["params"], make("plane"))
    for (pa, a), (pb, b2) in zip(
            jax.tree_util.tree_leaves_with_path(g_ref),
            jax.tree_util.tree_leaves_with_path(g_p)):
        scale = max(1.0, float(np.abs(np.asarray(a)).max()))
        np.testing.assert_allclose(np.asarray(b2) / scale,
                                   np.asarray(a) / scale,
                                   rtol=2e-3, atol=2e-3, err_msg=str(pa))
