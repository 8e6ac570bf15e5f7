"""VoxelNet + sparse backbone: end-to-end smoke and invariance tests."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sparse2dense_tpu.utils import Config
from sparse2dense_tpu.models import build_detector
from sparse2dense_tpu.models.builder import sparse_shape_from_voxel_cfg
from sparse2dense_tpu.training.synthetic import make_batch

CFG = os.path.join(os.path.dirname(__file__), "..", "configs", "tests", "voxelnet_tiny.py")


@pytest.fixture(scope="module")
def setup():
    cfg = Config.fromfile(CFG)
    model = build_detector(
        cfg.S_model, train_cfg=cfg.train_cfg, test_cfg=cfg.test_cfg,
        voxel_generator=cfg.voxel_generator,
    )
    batch = make_batch(cfg, batch_size=2, max_voxels=256, n_points=600, n_obj=3)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    return cfg, model, batch, variables


def test_sparse_shape_derivation():
    cfg = Config.fromfile(CFG)
    assert sparse_shape_from_voxel_cfg(cfg.voxel_generator) == (25, 32, 32)


def test_forward_shapes(setup):
    cfg, model, batch, variables = setup
    preds = model.apply(variables, batch, train=False)
    assert len(preds) == 1
    pd = preds[0]
    # 32/8 = 4 BEV cells after ds_factor 8
    assert pd["hm"].shape == (2, 4, 4, 3)
    assert pd["reg"].shape == (2, 4, 4, 2)
    assert all(np.isfinite(np.asarray(v)).all() for v in pd.values())


def test_loss_and_grad_finite(setup):
    cfg, model, batch, variables = setup

    def loss_fn(params):
        preds, mut = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            batch, train=True, mutable=["batch_stats"],
        )
        total, logs = model.loss(preds, batch)
        return total, logs

    (total, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(variables["params"])
    assert np.isfinite(float(total))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    gnorm = float(jnp.sqrt(sum(jnp.sum(g**2) for g in flat)))
    assert gnorm > 0


def test_predict(setup):
    cfg, model, batch, variables = setup
    preds = model.apply(variables, batch, train=False)
    out = model.predict(preds, cfg.test_cfg)
    assert out["box3d_lidar"].shape == (2, 8, 7)
    assert out["valid"].dtype == bool


def test_padding_invariance(setup):
    """Growing the voxel budget with extra padded rows must not change the BEV.

    Stage budgets are pinned explicitly: by default they track the input V, so
    a larger pad would legitimately keep downsample cells the smaller budget
    truncates.
    """
    cfg, _, batch, variables = setup
    import copy
    mcfg = copy.deepcopy(dict(cfg.S_model))
    mcfg["backbone"]["stage_budgets"] = (512, 512, 512, 512)
    model = build_detector(
        mcfg, train_cfg=cfg.train_cfg, test_cfg=cfg.test_cfg,
        voxel_generator=cfg.voxel_generator,
    )

    def bev_of(b):
        feats = model.apply(
            variables, b["voxels"], b["num_points"], b["coordinates"], False,
            method=lambda m, v, n, c, t: m.extract_feat(v, n, c, t)[2],
        )
        return np.asarray(feats)

    b1 = {k: batch[k] for k in ("voxels", "num_points", "coordinates")}
    pad = 64
    b2 = {
        "voxels": jnp.pad(b1["voxels"], ((0, 0), (0, pad), (0, 0), (0, 0))),
        "num_points": jnp.pad(b1["num_points"], ((0, 0), (0, pad))),
        "coordinates": jnp.pad(
            b1["coordinates"], ((0, 0), (0, pad), (0, 0)), constant_values=-1
        ),
    }
    np.testing.assert_allclose(bev_of(b1), bev_of(b2), rtol=1e-4, atol=1e-5)


def test_dense_voxels_substitution(setup):
    """With dense_* keys present the detector must consume them (teacher mode)."""
    cfg, model, batch, variables = setup
    dense = dict(batch)
    dense["dense_voxels"] = batch["voxels"] * 0.5
    dense["dense_coordinates"] = batch["coordinates"]
    dense["dense_num_points"] = batch["num_points"]
    p_base = model.apply(variables, batch, train=False)
    p_dense = model.apply(variables, dense, train=False)
    # different inputs -> different heatmaps
    assert not np.allclose(np.asarray(p_base[0]["hm"]), np.asarray(p_dense[0]["hm"]))


@pytest.mark.parametrize("engine,dfs", [
    ("gather", 0), ("gather", 1), ("gather", 2), ("gather", 3),
    ("column", 1), ("column", 2), ("column", 4),
    ("tile", 99), ("tile", 2), ("tile", 0),
])
def test_dense_mode_matches_sparse(setup, engine, dfs):
    """All engine/split-point combinations are the same operator: with shared
    params every variant must reproduce the fully-sparse gather BEV."""
    import copy
    cfg, _, batch, _ = setup

    def build(engine, dense_from_stage):
        mcfg = copy.deepcopy(dict(cfg.S_model))
        mcfg["backbone"]["engine"] = engine
        mcfg["backbone"]["dense_from_stage"] = dense_from_stage
        # large enough that the sparse path never truncates (the dense path
        # has no budget; truncation is the one intended divergence)
        mcfg["backbone"]["stage_budgets"] = (4096, 4096, 4096, 4096)
        mcfg["backbone"]["tile_budgets"] = (640, 512, 384, 128)
        return build_detector(mcfg, train_cfg=cfg.train_cfg,
                              test_cfg=cfg.test_cfg,
                              voxel_generator=cfg.voxel_generator)

    ref_model = build("gather", 99)
    variant = build(engine, dfs)
    variables = ref_model.init(jax.random.PRNGKey(0), batch, train=False)

    def bev_of(model):
        return np.asarray(model.apply(
            variables, batch["voxels"], batch["num_points"],
            batch["coordinates"], False,
            method=lambda m, v, n, c, t: m.extract_feat(v, n, c, t)[2],
        ))

    np.testing.assert_allclose(bev_of(variant), bev_of(ref_model),
                               rtol=1e-3, atol=1e-4)


def test_nusc_multitask_pillar():
    """nuScenes family: 6 tasks, velocity head, circular NMS."""
    cfg_path = os.path.join(os.path.dirname(__file__), "..", "configs",
                            "tests", "nusc_pp_tiny.py")
    cfg = Config.fromfile(cfg_path)
    model = build_detector(cfg.S_model, train_cfg=cfg.train_cfg,
                           test_cfg=cfg.test_cfg)
    batch = make_batch(cfg, batch_size=2, max_voxels=256, n_points=500, n_obj=6)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    preds = model.apply(variables, batch, train=False)
    assert len(preds) == 6
    assert preds[0]["vel"].shape == (2, 16, 16, 2)
    total, logs = model.loss(preds, batch)
    assert np.isfinite(float(total))
    out = model.predict(preds, cfg.test_cfg)
    # 6 tasks x post_max 16 candidates, labels offset per task
    assert out["box3d_lidar"].shape == (2, 96, 9)
    assert int(np.asarray(out["label_preds"]).max()) <= 9
