"""Trainer / TS_Trainer (reference det3d/torchie/trainer/trainer.py:209-892).

The epoch loop, hooks, checkpointing and eval gather live here on the host;
the entire optimization step (forward, loss, grad, clip, optimizer, lr
schedule — and for TS the teacher forward and all distillation losses) is ONE
jitted function over the mesh. Validation decodes fixed-size detections on
device, masks them on host, gathers across processes (single-process here;
multi-host would merge per-host shards) and calls dataset.evaluation —
the reference's Trainer.val flow (trainer.py:500-556).
"""
from __future__ import annotations

import logging
import os
from typing import Any, Callable, Optional

import jax
import numpy as np

from .checkpoint import load_checkpoint, save_checkpoint
from .hooks import LogBuffer, build_hooks
from .train_state import TrainState, make_train_step
from .distill import branch_of, make_ts_train_step


class Trainer:
    def __init__(self, model, state: TrainState, work_dir: str,
                 train_step: Optional[Callable] = None,
                 hooks=None, logger: Optional[logging.Logger] = None,
                 meta: Optional[dict] = None, mesh=None):
        self.model = model
        self.state = state
        self.work_dir = work_dir
        self.mesh = mesh
        if mesh is not None:
            from ..parallel.mesh import replicate

            # params/opt replicated on every device; gradient psum and SyncBN
            # statistics come from the SPMD partitioner (reference DDP+apex
            # SyncBN, torchie/apis/train.py:281,296-303)
            self.state = replicate(state, mesh)
        self.logger = logger or logging.getLogger("sparse2dense_tpu")
        self.log_buffer = LogBuffer()
        self.hooks = hooks if hooks is not None else build_hooks(work_dir=work_dir)
        self.epoch = 0
        self.inner_iter = 0
        self.global_iter = 0
        self.epoch_length = 0
        self.current_stats = {}
        self.meta = meta or {}
        self._train_step = train_step or jax.jit(make_train_step(model))

    def call_hook(self, name):
        for h in self.hooks:
            getattr(h, name)(self)

    # ------------------------------------------------------------ checkpoint
    def save_checkpoint(self, out_dir, name=None, latest=True, mid_epoch=False):
        name = name or f"epoch_{self.epoch + 1}"
        meta = dict(self.meta)
        # mid-epoch (preemption) saves resume by RESTARTING the interrupted
        # epoch: params/opt_state are current, data coverage stays complete
        meta.update(epoch=self.epoch if mid_epoch else self.epoch + 1,
                    iter=self.global_iter)
        tree = {
            "params": self.state.params,
            "batch_stats": self.state.batch_stats,
            "opt_state": self.state.opt_state,
            "step": self.state.step,
        }
        path = save_checkpoint(out_dir, name, tree, meta=meta, latest=latest)
        self.logger.info(f"saved checkpoint {path}")
        return path

    def resume(self, path):
        tree = {
            "params": self.state.params,
            "batch_stats": self.state.batch_stats,
            "opt_state": self.state.opt_state,
            "step": self.state.step,
        }
        restored, meta = load_checkpoint(path, target=tree)
        self.state = self.state.replace(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
            step=jax.numpy.asarray(restored["step"]),
        )
        self.epoch = int(meta.get("epoch", 0))
        self.global_iter = int(meta.get("iter", 0))
        self.logger.info(f"resumed from {path}: epoch {self.epoch}")

    # ----------------------------------------------------------------- train
    def step(self, batch):
        self.state, metrics = self._train_step(self.state, batch)
        return metrics

    def train_epoch(self, data_loader):
        self.epoch_length = len(data_loader)
        data_loader.set_epoch(self.epoch)
        self.call_hook("before_train_epoch")
        for i, batch in enumerate(data_loader):
            self.inner_iter = i
            batch.pop("metadata", None)  # host-only, not jittable
            if self.mesh is not None:
                from ..parallel.mesh import shard_batch

                batch = shard_batch(batch, self.mesh)
            self.call_hook("before_train_iter")
            metrics = self.step(batch)
            self.log_buffer.update(
                {k: float(v) for k, v in metrics.items()
                 if np.ndim(v) == 0}
            )
            self.call_hook("after_train_iter")
            self.global_iter += 1
        self.call_hook("after_train_epoch")
        self.epoch += 1

    def run(self, data_loader, max_epochs, val_loader=None, val_dataset=None,
            val_interval=0):
        self.call_hook("before_run")
        while self.epoch < max_epochs:
            self.train_epoch(data_loader)
            if val_loader is not None and val_interval and (
                self.epoch % val_interval == 0 or self.epoch == max_epochs
            ):
                self.val(val_loader, val_dataset)
        self.call_hook("after_run")

    # ------------------------------------------------------------------ eval
    def val(self, data_loader, dataset, output_dir=None):
        """(reference trainer.py:500-556): predict every batch, key results by
        metadata token, run dataset.evaluation on host."""
        variables = {"params": self.state.params,
                     "batch_stats": self.state.batch_stats}

        @jax.jit
        def infer(variables, batch_arrays):
            preds = self.model.apply(variables, batch_arrays, train=False)
            if isinstance(preds, dict) and "preds" in preds:  # two-stage/KD
                return self.model.predict(preds)
            return self.model.predict(preds, example=batch_arrays) \
                if _needs_example(self.model) else self.model.predict(preds)

        detections = {}
        proc = jax.process_index()
        for batch in data_loader:
            meta = batch.pop("metadata", [None] * 1)
            if self.mesh is not None:
                from ..parallel.mesh import shard_batch

                batch = shard_batch(batch, self.mesh)
            out = infer(variables, batch)
            boxes = np.asarray(out["box3d_lidar"])
            scores = np.asarray(out["scores"])
            labels = np.asarray(out["label_preds"])
            valid = np.asarray(out["valid"])
            for b in range(boxes.shape[0]):
                m = valid[b]
                if b < len(meta) and meta[b]:
                    token = meta[b]["token"]
                else:
                    # no metadata (synthetic/smoke loaders): key uniquely per
                    # process so a multi-host merge cannot silently collide
                    token = f"frame_p{proc}_{len(detections)}"
                detections[token] = {
                    "box3d_lidar": boxes[b][m],
                    "scores": scores[b][m],
                    "label_preds": labels[b][m],
                }
        out_dir = output_dir or os.path.join(self.work_dir, "eval")
        os.makedirs(out_dir, exist_ok=True)
        detections = gather_detections(detections, out_dir, self.logger)
        if detections is None:  # non-zero rank in a multi-host run
            return None, None
        return dataset.evaluation(detections, output_dir=out_dir)


def gather_detections(detections: dict, out_dir: str, logger) -> Optional[dict]:
    """Merge per-process detection dicts (reference all_gather eval merge,
    torchie/trainer/trainer.py:535-544 / utils.py:114-156).

    Multi-host: every process writes its shard to ``out_dir`` as a pickle,
    all processes synchronize on device, and process 0 merges; other ranks
    get None (the reference returns early on non-zero ranks too).
    Single-process: identity.
    """
    if jax.process_count() == 1:
        return detections
    import pickle

    shard_path = os.path.join(out_dir, f"detections_shard_{jax.process_index()}.pkl")
    with open(shard_path, "wb") as f:
        pickle.dump(detections, f)
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("sparse2dense_eval_gather")
    if jax.process_index() != 0:
        return None
    merged = {}
    for p in range(jax.process_count()):
        path = os.path.join(out_dir, f"detections_shard_{p}.pkl")
        with open(path, "rb") as f:
            shard = pickle.load(f)
        overlap = merged.keys() & shard.keys()
        if overlap:
            logger.warning(f"eval merge: {len(overlap)} duplicate tokens from "
                           f"process {p} (padded sampler tail?); keeping first")
        for k, v in shard.items():
            merged.setdefault(k, v)
    return merged


def _needs_example(model):
    from ..models.heads.mg_head import MultiGroupHead

    head = getattr(model, "bbox_head", None)
    return isinstance(head, MultiGroupHead)


class TS_Trainer(Trainer):
    """Teacher-student trainer (reference trainer.py:674-892): the teacher is
    frozen (no grads, eval-mode BN); distillation branch selected by the
    teacher backbone family.

    ``split_step``: jit the frozen teacher forward and the student update as
    SEPARATE functions instead of one fused graph. The fused graph
    co-schedules the teacher's multi-GB dense activations with the student's
    fwd+bwd (measured 25.7 GB peak at the full Waymo grid vs 15.75 GB HBM);
    splitting lets the teacher's working set die before the student update
    allocates, and the two smaller graphs also compile far faster (the fused
    jit_ts_step took 4m8s on CPU). "auto" splits when the student backbone
    grid is production-scale (H >= 512); True/False force."""

    def __init__(self, teacher, t_variables, student, state: TrainState,
                 work_dir: str, teacher_cfg: dict, split_step="auto", **kw):
        branch = branch_of(teacher_cfg)
        ts = make_ts_train_step(teacher, student, branch)
        super().__init__(student, state, work_dir,
                         train_step=None, **kw)
        if split_step == "auto":
            shape = getattr(getattr(student, "backbone", None),
                            "sparse_shape", (0, 0, 0))
            split_step = shape[1] >= 512
        self.split_step = bool(split_step)
        if self.split_step:
            self._teacher_fwd = jax.jit(ts.teacher_forward)
            self._student_step = jax.jit(ts.student_step)
            self._ts_step = None
        else:
            self._ts_step = jax.jit(ts)
        self.t_variables = t_variables
        self.branch = branch

    def step(self, batch):
        if self.split_step:
            t_out = self._teacher_fwd(self.t_variables, batch)
            self.state, metrics = self._student_step(t_out, self.state, batch)
        else:
            self.state, metrics = self._ts_step(self.t_variables, self.state,
                                                batch)
        return metrics
