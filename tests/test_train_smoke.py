"""End-to-end train smoke: loss decreases on a tiny synthetic problem, the
jitted step runs data-parallel over an 8-device mesh, and the one-cycle
schedule matches the reference phase shapes."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sparse2dense_tpu.utils import Config
from sparse2dense_tpu.models import build_detector
from sparse2dense_tpu.solver.optim import build_optimizer
from sparse2dense_tpu.solver.schedules import one_cycle_lr, one_cycle_momentum
from sparse2dense_tpu.training.train_state import TrainState, make_train_step
from sparse2dense_tpu.training.synthetic import make_batch
from sparse2dense_tpu.parallel.mesh import make_mesh, shard_batch, replicate

CFG = os.path.join(os.path.dirname(__file__), "..", "configs", "tests", "pp_tiny.py")


def _setup(batch_size=2, total_steps=20):
    cfg = Config.fromfile(CFG)
    model = build_detector(cfg.S_model, train_cfg=cfg.train_cfg, test_cfg=cfg.test_cfg)
    batch = make_batch(cfg, batch_size, max_voxels=256, n_points=600, n_obj=4)
    tx = build_optimizer(cfg.optimizer, cfg.lr_config, total_steps,
                         grad_clip=cfg.optimizer_config["grad_clip"])
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables["batch_stats"], tx=tx,
    )
    return cfg, model, state, batch


def test_loss_decreases():
    cfg, model, state, batch = _setup()
    step = jax.jit(make_train_step(model))
    losses = []
    for _ in range(12):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.7, losses


def test_multi_device_data_parallel():
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    cfg, model, state, batch = _setup(batch_size=8)
    mesh = make_mesh()
    state = replicate(state, mesh)
    batch = shard_batch(batch, mesh)
    step = jax.jit(make_train_step(model))
    state2, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    # params stay replicated and identical across devices
    p = jax.tree.leaves(state2.params)[0]
    assert p.sharding.is_fully_replicated


def test_one_cycle_schedule_shape():
    lr = one_cycle_lr(0.003, 10.0, 0.4, 100)
    mom = one_cycle_momentum((0.95, 0.85), 0.4, 100)
    assert np.isclose(float(lr(0)), 0.0003)
    assert np.isclose(float(lr(40)), 0.003)
    assert float(lr(99)) < 1e-5
    assert np.isclose(float(mom(0)), 0.95)
    assert np.isclose(float(mom(40)), 0.85)
    mid = float(lr(20))
    assert 0.0003 < mid < 0.003


def test_predict_shapes():
    cfg, model, state, batch = _setup()
    preds, _ = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        batch, train=True, mutable=["batch_stats"],
    )
    dets = model.predict(preds, cfg.test_cfg)
    assert dets["box3d_lidar"].shape == (2, 16, 7)
    assert dets["scores"].shape == (2, 16)
    assert dets["valid"].dtype == jnp.bool_
