"""Teacher-student distillation: S2D/PCR modules and the TS train step."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sparse2dense_tpu.utils import Config
from sparse2dense_tpu.models import build_detector
from sparse2dense_tpu.solver.optim import build_optimizer
from sparse2dense_tpu.training.synthetic import make_batch
from sparse2dense_tpu.training.train_state import TrainState
from sparse2dense_tpu.training.distill import (
    branch_of,
    make_ts_train_step,
    masked_mse,
)
from sparse2dense_tpu.models.detectors.kd import world_grid

CFG = os.path.join(os.path.dirname(__file__), "..", "configs", "tests", "distill_tiny.py")


@pytest.fixture(scope="module")
def setup():
    cfg = Config.fromfile(CFG)
    teacher = build_detector(cfg.model, train_cfg=cfg.train_cfg, test_cfg=cfg.test_cfg,
                             voxel_generator=cfg.voxel_generator)
    student = build_detector(cfg.S_model, train_cfg=cfg.train_cfg, test_cfg=cfg.test_cfg,
                             voxel_generator=cfg.voxel_generator)
    batch = make_batch(cfg, batch_size=2, max_voxels=192, n_points=400, n_obj=3,
                       distillation=True)
    t_vars = teacher.init(jax.random.PRNGKey(0), batch, train=False)
    s_vars = student.init(jax.random.PRNGKey(1), batch, train=True)
    return cfg, teacher, student, batch, t_vars, s_vars


def test_branch_detection():
    cfg = Config.fromfile(CFG)
    assert branch_of(cfg.model) == "centerpoint"
    assert branch_of({"backbone": {"type": "PointPillarsScatter"}}) == "pp"
    assert branch_of({"backbone": {"type": "SpMiddleFHD"}}) == "second"


def test_masked_mse_matches_boolean_indexing():
    rng = np.random.RandomState(0)
    a = rng.randn(4, 5).astype(np.float32)
    b = rng.randn(4, 5).astype(np.float32)
    m = b > 0
    want = np.mean((a[m] - b[m]) ** 2)
    got = float(masked_mse(jnp.asarray(a), jnp.asarray(b), jnp.asarray(m)))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_world_grid_centers():
    g = np.asarray(world_grid((2, 4, 4), (-8, -8, -2, 8, 8, 4)))
    assert g.shape == (2, 4, 4, 3)
    np.testing.assert_allclose(g[0, 0, 0], [-6.0, -6.0, -0.5])  # first cell center
    np.testing.assert_allclose(g[-1, -1, -1], [6.0, 6.0, 2.5])  # last cell center


def test_student_forward_shapes(setup):
    cfg, teacher, student, batch, t_vars, s_vars = setup
    out, _ = student.apply(s_vars, batch, train=True, mutable=["batch_stats"])
    assert out["f_s_a"].shape == out["f_s_b"].shape == (2, 4, 4, 256)
    # PCR pyramids (z-FOLDED (B,H,W,D*C)): D=10 at 1/4 grid (8x8), D=20
    # at 1/2 grid (16x16)
    assert out["gen_offset_4"].shape == (2, 8, 8, 10 * 3)
    assert out["gen_mask_4"].shape == (2, 8, 8, 10)
    assert out["gen_offset_2"].shape == (2, 16, 16, 20 * 3)
    assert out["gen_mask_2"].shape == (2, 16, 16, 20)
    # eval: PCR off
    out_eval = student.apply(s_vars, batch, train=False)
    assert out_eval["gen_offset_2"] is None


def test_ts_train_step(setup):
    cfg, teacher, student, batch, t_vars, s_vars = setup
    tx = build_optimizer(cfg.optimizer, cfg.lr_config, total_steps=10,
                         grad_clip=cfg.optimizer_config["grad_clip"])
    state = TrainState.create(
        apply_fn=student.apply, params=s_vars["params"],
        batch_stats=s_vars["batch_stats"], tx=tx,
    )
    step = jax.jit(make_ts_train_step(teacher, student, branch_of(cfg.model)))
    state, metrics = step(t_vars, state, batch)
    for k in ("loss", "sparse2dense_loss", "kd_hm_loss", "kd_reg_loss",
              "mask_loss", "reconstruction_loss", "T_hm_loss", "grad_norm"):
        assert k in metrics, k
        assert np.isfinite(float(metrics[k])), (k, float(metrics[k]))
    assert float(metrics["grad_norm"]) > 0
    assert int(state.step) == 1


def test_ts_second_branch():
    """The third distillation branch: SECOND teacher (MultiGroupHead) +
    KD_VoxelNet student with S2D — masked feature MSE only."""
    cfg = Config.fromfile(os.path.join(
        os.path.dirname(__file__), "..", "configs", "tests",
        "second_distill_tiny.py"))
    teacher = build_detector(cfg.model, train_cfg=cfg.train_cfg,
                             test_cfg=cfg.test_cfg,
                             voxel_generator=cfg.voxel_generator)
    student = build_detector(cfg.S_model, train_cfg=cfg.train_cfg,
                             test_cfg=cfg.test_cfg,
                             voxel_generator=cfg.voxel_generator)
    assert branch_of(cfg.model) == "second"
    batch = make_batch(cfg, batch_size=1, max_voxels=128, n_points=300,
                       n_obj=2, distillation=True)
    t_vars = teacher.init(jax.random.PRNGKey(0), batch, train=False)
    s_vars = student.init(jax.random.PRNGKey(1), batch, train=True)
    tx = build_optimizer(cfg.optimizer, cfg.lr_config, total_steps=4,
                         grad_clip=cfg.optimizer_config["grad_clip"])
    state = TrainState.create(apply_fn=student.apply, params=s_vars["params"],
                              batch_stats=s_vars["batch_stats"], tx=tx)
    step = jax.jit(make_ts_train_step(teacher, student, "second"))
    state, metrics = step(t_vars, state, batch)
    for k in ("loss", "sparse2dense_loss", "mask_loss", "reconstruction_loss"):
        assert np.isfinite(float(metrics[k])), (k, float(metrics[k]))
    assert "kd_hm_loss" not in metrics  # SECOND branch: feature MSE only


def test_ts_training_converges(setup):
    """A few TS steps must reduce the combined distillation objective —
    validates gradient flow through the S2D/PCR student end to end.
    (lr kept small: at the config's one-cycle lr_max the 8-step trajectory on
    this tiny synthetic problem is still in the noisy warmup phase.)"""
    cfg, teacher, student, batch, t_vars, s_vars = setup
    lr_cfg = dict(cfg.lr_config)
    lr_cfg["lr_max"] = 1e-4
    tx = build_optimizer(cfg.optimizer, lr_cfg, total_steps=200,
                         grad_clip=cfg.optimizer_config["grad_clip"])
    state = TrainState.create(apply_fn=student.apply, params=s_vars["params"],
                              batch_stats=s_vars["batch_stats"], tx=tx)
    step = jax.jit(make_ts_train_step(teacher, student, branch_of(cfg.model)))
    losses = []
    for _ in range(6):
        state, metrics = step(t_vars, state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert min(losses[-3:]) < losses[0], losses


def test_kd_student_eval_predict(setup):
    """The deployed artifact is the KD student: its __call__ dict output must
    decode through predict (the Trainer.val / tools.test path)."""
    cfg, teacher, student, batch, t_vars, s_vars = setup
    out = student.apply(s_vars, batch, train=False)
    dets = student.predict(out, cfg.test_cfg)
    assert dets["box3d_lidar"].shape == (2, 8, 7)
    assert dets["valid"].dtype == bool
