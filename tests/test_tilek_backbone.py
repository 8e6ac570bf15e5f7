"""SpMiddleResNetFHD: fused Pallas tile backend (eval) vs XLA tile engine —
same params, same inputs, same BEV output. Interpreter-mode kernel on CPU."""
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


def make(backend, dfs=99):
    return SpMiddleResNetFHD(
        num_input_features=5, sparse_shape=GRID, engine="tile",
        tile_backend=backend, tile_tz=(8, 4, 2, 6), tile_size=(4, 4),
        tile_budgets=(800, 500, 300, 200), dense_from_stage=dfs,
        tilek_window=10 ** 6)


def test_tilek_matches_tile_engine():
    feats, coords = scene()
    ref_bb = make("xla")
    variables = ref_bb.init(jax.random.PRNGKey(0), feats, coords, False)
    bev_ref, ms_ref = ref_bb.apply(variables, feats, coords, False)

    k_bb = make("pallas")
    bev_k, ms_k = k_bb.apply(variables, feats, coords, False)

    assert bev_k.shape == bev_ref.shape
    np.testing.assert_allclose(np.asarray(bev_k), np.asarray(bev_ref),
                               rtol=1e-4, atol=1e-4)
    # multi-scale planes parity at conv2 (pre-padding rows only)
    (p_r, m_r, _), _ = ms_ref["conv2"]
    (p_k, m_k, _), _ = ms_k["conv2"]
    mm = np.asarray(m_r)[..., 0] > 0
    np.testing.assert_allclose(np.asarray(p_k)[mm], np.asarray(p_r)[mm],
                               rtol=1e-4, atol=1e-4)


def test_tilek_init_tree_matches():
    feats, coords = scene(1)
    v_ref = make("xla").init(jax.random.PRNGKey(0), feats, coords, False)
    v_k = make("pallas").init(jax.random.PRNGKey(0), feats, coords, False)
    # checkpointed collections must be identical (telemetry may differ)
    for coll in ("params", "batch_stats"):
        ref_tree = jax.tree_util.tree_structure(v_ref[coll])
        k_tree = jax.tree_util.tree_structure(v_k[coll])
        assert ref_tree == k_tree, coll
        for (pa, a), (pb, b2) in zip(
                jax.tree_util.tree_leaves_with_path(v_ref[coll]),
                jax.tree_util.tree_leaves_with_path(v_k[coll])):
            assert a.shape == b2.shape, (pa, a.shape, b2.shape)


def test_tilek_init_tree_matches_dfs0():
    """dfs=0 (fully dense): conv_input must see the raw channel count,
    not the kernel's 16-channel padding (ADVICE r4)."""
    feats, coords = scene(1)
    v_ref = make("xla", dfs=0).init(jax.random.PRNGKey(0), feats, coords,
                                    False)
    v_k = make("pallas", dfs=0).init(jax.random.PRNGKey(0), feats, coords,
                                     False)
    for coll in ("params", "batch_stats"):
        assert (jax.tree_util.tree_structure(v_ref[coll])
                == jax.tree_util.tree_structure(v_k[coll])), coll
        for (pa, a), (pb, b2) in zip(
                jax.tree_util.tree_leaves_with_path(v_ref[coll]),
                jax.tree_util.tree_leaves_with_path(v_k[coll])):
            assert a.shape == b2.shape, (pa, a.shape, b2.shape)


def test_tilek_dense_tail():
    """dfs=2: tile kernel for conv1-2, dense stages after — parity again."""
    feats, coords = scene(2)
    ref_bb = make("xla", dfs=2)
    variables = ref_bb.init(jax.random.PRNGKey(1), feats, coords, False)
    bev_ref, _ = ref_bb.apply(variables, feats, coords, False)
    bev_k, _ = make("pallas", dfs=2).apply(variables, feats, coords, False)
    np.testing.assert_allclose(np.asarray(bev_k), np.asarray(bev_ref),
                               rtol=1e-4, atol=1e-4)
