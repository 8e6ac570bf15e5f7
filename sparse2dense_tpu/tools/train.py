"""Training entry point (reference tools/train.py:64-155).

Usage:
    python -m sparse2dense_tpu.tools.train <config.py> [--work_dir D]
        [--resume_from CKPT] [--seed N] [--batch_size B] [--max_voxels V]
        [--epochs E] [--synthetic N]

Reference semantics preserved: with cfg.distillation the teacher is built
from cfg.model and the student from cfg.S_model, the teacher checkpoint comes
from cfg.load_from, and training runs the TS (distillation) step; otherwise a
plain detector trains from cfg.S_model. ``--synthetic N`` substitutes an
N-frame synthetic dataset for smoke runs without data on disk.
"""
from __future__ import annotations

import argparse
import logging
import os


def parse_args():
    p = argparse.ArgumentParser(description="Train a detector")
    p.add_argument("config")
    p.add_argument("--work_dir", default=None)
    p.add_argument("--resume_from", default=None)
    p.add_argument("--load_from", default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--max_voxels", type=int, default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--synthetic", type=int, default=0,
                   help="train on N synthetic frames instead of cfg.data")
    p.add_argument("--launcher", default="none", choices=["none", "jax"],
                   help="'jax' bootstraps multi-process training via "
                        "jax.distributed.initialize() (reference init_dist)")
    p.add_argument("--no_mesh", action="store_true",
                   help="disable the device mesh (single-device step)")
    p.add_argument("--ts_step", default="auto",
                   choices=["auto", "fused", "split"],
                   help="distillation step graph: 'split' jits the teacher "
                        "forward and the student update separately (halves "
                        "the HBM peak at the full Waymo grid and compiles "
                        "much faster); 'auto' splits at production grids")
    return p.parse_args()


def main():
    args = parse_args()
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(levelname)s %(message)s")
    logger = logging.getLogger("sparse2dense_tpu")

    from ..utils.platform import enforce_platform_from_env

    enforce_platform_from_env()

    import jax

    from ..utils import Config
    from ..models import build_detector
    from ..parallel.mesh import init_distributed, make_mesh
    from ..solver.optim import build_optimizer
    from ..training.train_state import TrainState
    from ..training.trainer import Trainer, TS_Trainer
    from ..training.hooks import build_hooks
    from ..training.checkpoint import load_checkpoint, merge_params

    proc_id, proc_count = init_distributed(args.launcher)
    cfg = Config.fromfile(args.config)
    work_dir = args.work_dir or cfg.get("work_dir", "./work_dir")
    os.makedirs(work_dir, exist_ok=True)
    distillation = bool(cfg.get("distillation", False))
    total_epochs = args.epochs or cfg.total_epochs
    # reference semantics: samples_per_gpu is PER DEVICE; the jitted step sees
    # the per-process batch (global when single-process), sharded on the mesh
    mesh = None if args.no_mesh else make_mesh()
    per_device = args.batch_size or cfg.get("data", {}).get("samples_per_gpu", 4)
    batch_size = per_device * (jax.local_device_count() if mesh is not None else 1)
    if mesh is not None:
        logger.info(
            f"mesh: {jax.device_count()} devices / {proc_count} processes, "
            f"batch {per_device}/device -> {batch_size}/process")
    max_voxels = args.max_voxels or _default_max_voxels(cfg)

    # ---- data
    if args.synthetic:
        from ..training.synthetic import make_batch

        class SyntheticLoader:
            def __init__(self, n):
                self.n = max(n // batch_size, 1)

            def __len__(self):
                return self.n

            def set_epoch(self, e):
                self.e = e

            def __iter__(self):
                for i in range(self.n):
                    yield make_batch(cfg, batch_size, max_voxels=max_voxels,
                                     seed=i, distillation=distillation)

        train_loader = SyntheticLoader(args.synthetic)
        epoch_len = len(train_loader)
    else:
        from ..data.loader import InputPipeline, build_dataset

        dataset = build_dataset(cfg.data["train"], distillation=distillation)
        train_loader = InputPipeline(
            dataset, batch_size=batch_size, max_voxels=max_voxels,
            seed=args.seed, num_shards=proc_count, shard_id=proc_id,
            num_workers=int(cfg.data.get("workers_per_gpu", 4) or 0),
        )
        epoch_len = len(train_loader)

    total_steps = max(epoch_len * total_epochs, 1)
    tx = build_optimizer(cfg.optimizer, cfg.lr_config, total_steps=total_steps,
                         grad_clip=cfg.optimizer_config.get("grad_clip"))

    # ---- models
    student = build_detector(cfg.S_model, train_cfg=cfg.train_cfg,
                             test_cfg=cfg.test_cfg,
                             voxel_generator=cfg.get("voxel_generator"))
    sample = _sample_batch(cfg, batch_size, max_voxels, distillation)
    rngs = {"params": jax.random.PRNGKey(args.seed),
            "proposal": jax.random.PRNGKey(args.seed + 1),
            "dropout": jax.random.PRNGKey(args.seed + 2)}
    s_vars = student.init(rngs, sample, train=True)
    state = TrainState.create(
        apply_fn=student.apply, params=s_vars["params"],
        batch_stats=s_vars.get("batch_stats", {}), tx=tx,
    )
    meta = {"config": cfg.text, "classes": list(cfg.get("class_names", []))}
    hooks = build_hooks(cfg.get("log_config"),
                        cfg.get("checkpoint_config") or {"interval": 1},
                        work_dir=work_dir)

    if distillation:
        teacher = build_detector(cfg.model, train_cfg=cfg.train_cfg,
                                 test_cfg=cfg.test_cfg,
                                 voxel_generator=cfg.get("voxel_generator"))
        t_vars = teacher.init(jax.random.PRNGKey(args.seed + 9), sample,
                              train=False)
        load_from = args.load_from or cfg.get("load_from")
        if load_from:
            restored, _ = load_checkpoint(load_from)
            t_vars = {
                "params": merge_params(t_vars["params"], restored["params"], logger),
                "batch_stats": merge_params(
                    t_vars.get("batch_stats", {}),
                    restored.get("batch_stats", {}), logger),
            }
            logger.info(f"loaded teacher checkpoint {load_from}")
        if mesh is not None:
            from ..parallel.mesh import replicate

            t_vars = replicate(t_vars, mesh)
        split = {"auto": "auto", "fused": False, "split": True}[args.ts_step]
        trainer = TS_Trainer(teacher, t_vars, student, state, work_dir,
                             teacher_cfg=dict(cfg.model), hooks=hooks,
                             logger=logger, meta=meta, mesh=mesh,
                             split_step=split)
        logger.info(f"TS step graph: "
                    f"{'split' if trainer.split_step else 'fused'}")
    else:
        trainer = Trainer(student, state, work_dir, hooks=hooks, logger=logger,
                          meta=meta, mesh=mesh)

    if args.resume_from:
        trainer.resume(args.resume_from)

    logger.info(f"start training: {total_epochs} epochs x {epoch_len} iters, "
                f"distillation={distillation}")
    trainer.run(train_loader, total_epochs)
    logger.info("training finished")
    return trainer


def _default_max_voxels(cfg):
    mv = cfg.voxel_generator["max_voxel_num"]
    return mv[0] if isinstance(mv, (list, tuple)) else mv


def _sample_batch(cfg, batch_size, max_voxels, distillation):
    from ..training.synthetic import make_batch

    return make_batch(cfg, batch_size, max_voxels=max_voxels, n_points=500,
                      n_obj=3, distillation=distillation)


if __name__ == "__main__":
    main()
