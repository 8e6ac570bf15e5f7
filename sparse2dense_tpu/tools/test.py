"""Evaluation entry point — rebuild of the reference's (absent) tools/dist_test.py
whose upstream CenterPoint shape is documented in docs/WAYMO.md:103-121:
build the val loader, load a checkpoint, loop batches, gather detections, run
dataset.evaluation. Adds ``--speed_test`` (per-frame latency, skipping the
first warmup frames) and ``--testset``.

Usage:
    python -m sparse2dense_tpu.tools.test <config.py> --checkpoint CKPT
        [--work_dir D] [--batch_size B] [--speed_test] [--testset]
"""
from __future__ import annotations

import argparse
import logging
import os
import time


def parse_args():
    p = argparse.ArgumentParser(description="Evaluate a detector")
    p.add_argument("config")
    p.add_argument("--checkpoint", required=False, default=None)
    p.add_argument("--work_dir", default="./work_dir")
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--max_voxels", type=int, default=None)
    p.add_argument("--speed_test", action="store_true")
    p.add_argument("--testset", action="store_true")
    p.add_argument("--launcher", default="none", choices=["none", "jax"])
    p.add_argument("--no_mesh", action="store_true")
    return p.parse_args()


def main():
    args = parse_args()
    logging.basicConfig(level=logging.INFO)
    logger = logging.getLogger("sparse2dense_tpu")

    from ..utils.platform import enforce_platform_from_env

    enforce_platform_from_env()

    import jax
    import numpy as np

    from ..utils import Config
    from ..models import build_detector
    from ..data.loader import InputPipeline, build_dataset
    from ..training.checkpoint import load_checkpoint, merge_params
    from ..training.synthetic import make_batch

    from ..parallel.mesh import init_distributed, make_mesh, shard_batch

    proc_id, proc_count = init_distributed(args.launcher)
    mesh = None if args.no_mesh else make_mesh()
    cfg = Config.fromfile(args.config)
    model = build_detector(cfg.S_model, train_cfg=cfg.train_cfg,
                           test_cfg=cfg.test_cfg,
                           voxel_generator=cfg.get("voxel_generator"))
    mv = cfg.voxel_generator["max_voxel_num"]
    max_voxels = args.max_voxels or (mv[1] if isinstance(mv, (list, tuple)) else mv)
    if mesh is not None and not args.speed_test:
        # eval sharded over devices; speed_test keeps batch-1 single-device
        # latency semantics (the reference measures one GPU)
        args.batch_size = args.batch_size * jax.local_device_count()
        logger.info(f"mesh: {jax.device_count()} devices / {proc_count} "
                    f"processes, eval batch {args.batch_size}/process")

    sample = make_batch(cfg, args.batch_size, max_voxels=max_voxels,
                        n_points=500, n_obj=3, with_targets=False)
    variables = model.init(jax.random.PRNGKey(0), sample, train=False)
    if args.checkpoint:
        restored, _ = load_checkpoint(args.checkpoint)
        variables = {
            "params": merge_params(variables["params"], restored["params"], logger),
            "batch_stats": merge_params(
                variables.get("batch_stats", {}),
                restored.get("batch_stats", {}), logger),
        }
        logger.info(f"loaded {args.checkpoint}")

    split = "test" if args.testset else "val"
    dataset = build_dataset(cfg.data[split])
    loader = InputPipeline(dataset, batch_size=args.batch_size,
                           max_voxels=max_voxels, shuffle=False,
                           num_shards=proc_count, shard_id=proc_id,
                           num_workers=int(cfg.data.get("workers_per_gpu", 4) or 0))

    @jax.jit
    def infer(variables, batch):
        preds = model.apply(variables, batch, train=False)
        if isinstance(preds, dict) and "preds" in preds:
            return model.predict(preds)
        try:
            return model.predict(preds, cfg.test_cfg, example=batch)
        except TypeError:
            return model.predict(preds, cfg.test_cfg)

    detections = {}
    times = []
    for i, batch in enumerate(loader):
        meta = batch.pop("metadata")
        if mesh is not None and not args.speed_test:
            batch = shard_batch(batch, mesh)
        t0 = time.perf_counter()
        out = jax.block_until_ready(infer(variables, batch))
        if i >= 2:  # skip compile/warmup frames
            times.append(time.perf_counter() - t0)
        boxes = np.asarray(out["box3d_lidar"])
        scores = np.asarray(out["scores"])
        labels = np.asarray(out["label_preds"])
        valid = np.asarray(out["valid"])
        for b in range(boxes.shape[0]):
            m = valid[b]
            if b < len(meta) and meta[b]:
                token = meta[b]["token"]
            else:
                token = f"frame_p{proc_id}_{len(detections)}"
            detections[token] = {
                "box3d_lidar": boxes[b][m],
                "scores": scores[b][m],
                "label_preds": labels[b][m],
            }
    if args.speed_test and times:
        fps = args.batch_size / (sum(times) / len(times))
        logger.info(f"inference: {fps:.2f} frames/s "
                    f"({1000 * sum(times) / len(times):.1f} ms/batch)")
    os.makedirs(args.work_dir, exist_ok=True)
    from ..training.trainer import gather_detections

    detections = gather_detections(detections, args.work_dir, logger)
    if detections is None:  # non-zero rank of a multi-host run
        return None
    result = dataset.evaluation(detections, output_dir=args.work_dir,
                                testset=args.testset)
    logger.info(f"evaluation result: {result}")
    return detections


if __name__ == "__main__":
    main()
