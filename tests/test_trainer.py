"""Trainer runtime: epoch loop, hooks, checkpoint save/resume, train CLI."""
import os
import sys

import numpy as np
import pytest

import jax

from sparse2dense_tpu.utils import Config
from sparse2dense_tpu.models import build_detector
from sparse2dense_tpu.solver.optim import build_optimizer
from sparse2dense_tpu.training.synthetic import make_batch
from sparse2dense_tpu.training.train_state import TrainState
from sparse2dense_tpu.training.trainer import Trainer
from sparse2dense_tpu.training.hooks import LogBuffer, build_hooks

CFG = os.path.join(os.path.dirname(__file__), "..", "configs", "tests", "pp_tiny.py")


def test_log_buffer_windowed_average():
    buf = LogBuffer()
    for v in (1.0, 2.0, 3.0, 4.0):
        buf.update({"loss": v})
    buf.average(2)
    assert buf.output["loss"] == pytest.approx(3.5)
    buf.average()
    assert buf.output["loss"] == pytest.approx(2.5)


class _Loader:
    def __init__(self, cfg, n, bs):
        self.batches = [
            make_batch(cfg, bs, max_voxels=128, n_points=300, n_obj=2, seed=i)
            for i in range(n)
        ]

    def __len__(self):
        return len(self.batches)

    def set_epoch(self, e):
        pass

    def __iter__(self):
        return iter([dict(b) for b in self.batches])


@pytest.fixture(scope="module")
def trainer_setup(tmp_path_factory):
    cfg = Config.fromfile(CFG)
    work_dir = str(tmp_path_factory.mktemp("work"))
    model = build_detector(cfg.S_model, train_cfg=cfg.train_cfg,
                           test_cfg=cfg.test_cfg)
    loader = _Loader(cfg, n=2, bs=2)
    batch = loader.batches[0]
    variables = model.init(jax.random.PRNGKey(0), batch, train=True)
    tx = build_optimizer(cfg.optimizer, cfg.lr_config, total_steps=8,
                         grad_clip=cfg.optimizer_config["grad_clip"])
    state = TrainState.create(apply_fn=model.apply, params=variables["params"],
                              batch_stats=variables["batch_stats"], tx=tx)
    hooks = build_hooks(dict(interval=1), dict(interval=1), work_dir=work_dir)
    tr = Trainer(model, state, work_dir, hooks=hooks)
    return cfg, model, loader, tr, work_dir


def test_train_epoch_and_checkpoint(trainer_setup):
    cfg, model, loader, tr, work_dir = trainer_setup
    tr.train_epoch(loader)
    assert tr.epoch == 1
    assert tr.global_iter == 2
    assert int(tr.state.step) == 2
    # checkpoint written by the hook
    assert os.path.isdir(os.path.join(work_dir, "epoch_1"))
    assert os.path.islink(os.path.join(work_dir, "latest"))


def test_resume_roundtrip(trainer_setup):
    cfg, model, loader, tr, work_dir = trainer_setup
    path = os.path.join(work_dir, "epoch_1")
    # fresh trainer resumes to epoch 1 with identical params
    variables = model.init(jax.random.PRNGKey(7), loader.batches[0], train=True)
    tx = build_optimizer(cfg.optimizer, cfg.lr_config, total_steps=8,
                         grad_clip=cfg.optimizer_config["grad_clip"])
    state = TrainState.create(apply_fn=model.apply, params=variables["params"],
                              batch_stats=variables["batch_stats"], tx=tx)
    tr2 = Trainer(model, state, work_dir, hooks=[])
    tr2.resume(path)
    assert tr2.epoch == 1
    a = jax.tree_util.tree_leaves(tr.state.params)
    b = jax.tree_util.tree_leaves(tr2.state.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_intra_epoch_preempt_checkpoint(trainer_setup, tmp_path):
    """Rolling 'preempt' saves every iter_interval iters; resuming one
    restarts the interrupted epoch (preemption-safe TPU training)."""
    cfg, model, loader, tr, _ = trainer_setup
    work = str(tmp_path / "preempt_work")
    hooks = build_hooks(dict(interval=100), dict(interval=100, iter_interval=1),
                        work_dir=work)
    tr2 = Trainer(model, tr.state, work, hooks=hooks)
    tr2.train_epoch(loader)
    assert os.path.isdir(os.path.join(work, "preempt"))
    # preempt save does NOT repoint 'latest' and resumes into the same epoch
    assert not os.path.exists(os.path.join(work, "latest"))
    tr3 = Trainer(model, tr.state, work, hooks=[])
    tr3.resume(os.path.join(work, "preempt"))
    assert tr3.epoch == 0


def test_tensorboard_hook(trainer_setup, tmp_path):
    cfg, model, loader, tr, _ = trainer_setup
    work = str(tmp_path / "tb_work")
    hooks = build_hooks(
        dict(interval=1, hooks=[dict(type="TextLoggerHook"),
                                dict(type="TensorboardLoggerHook")]),
        None, work_dir=work)
    tr2 = Trainer(model, tr.state, work, hooks=hooks)
    tr2.call_hook("before_run")
    tr2.train_epoch(loader)
    tr2.call_hook("after_run")
    tb_dir = os.path.join(work, "tf_logs")
    files = os.listdir(tb_dir)
    assert any("tfevents" in f for f in files)


def test_train_cli_synthetic(tmp_path, monkeypatch):
    from sparse2dense_tpu.tools import train as train_cli

    work = str(tmp_path / "cli_work")
    monkeypatch.setattr(
        sys, "argv",
        ["train", CFG, "--work_dir", work, "--synthetic", "2",
         "--batch_size", "2", "--max_voxels", "128", "--epochs", "1"],
    )
    trainer = train_cli.main()
    assert trainer.epoch == 1
    assert os.path.isdir(os.path.join(work, "epoch_1"))
