"""Standalone batch inference (reference tools/simple_inference_waymo.py:25-215).

Loads a config + checkpoint, voxelizes raw frames on the host, runs the
jitted forward per frame with latency measurement, dumps detections.pkl.

Usage:
    python -m sparse2dense_tpu.tools.simple_inference <config.py>
        --checkpoint CKPT --input <infos.pkl or dir of frame pkls>
        [--output detections.pkl] [--bf16]
"""
from __future__ import annotations

import argparse
import glob
import logging
import os
import pickle
import time

import numpy as np


def initialize_model(cfg_path, checkpoint=None, logger=None):
    """(reference simple_inference_waymo.py:25-40)."""
    from ..utils.platform import enforce_platform_from_env

    enforce_platform_from_env()

    import jax

    from ..utils import Config
    from ..models import build_detector
    from ..training.checkpoint import load_checkpoint, merge_params
    from ..training.synthetic import make_batch

    cfg = Config.fromfile(cfg_path)
    model = build_detector(cfg.S_model, train_cfg=cfg.train_cfg,
                           test_cfg=cfg.test_cfg,
                           voxel_generator=cfg.get("voxel_generator"))
    mv = cfg.voxel_generator["max_voxel_num"]
    max_voxels = mv[1] if isinstance(mv, (list, tuple)) else mv
    sample = make_batch(cfg, 1, max_voxels=max_voxels, n_points=500,
                        n_obj=2, with_targets=False)
    variables = model.init(jax.random.PRNGKey(0), sample, train=False)
    if checkpoint:
        restored, _ = load_checkpoint(checkpoint)
        variables = {
            "params": merge_params(variables["params"], restored["params"], logger),
            "batch_stats": merge_params(
                variables.get("batch_stats", {}),
                restored.get("batch_stats", {}), logger),
        }
    return cfg, model, variables, max_voxels


def process_inputs(cfg, points, max_voxels):
    """Voxelize one frame and pad to the static budget
    (reference simple_inference_waymo.py:61-90)."""
    import jax.numpy as jnp

    from ..ops.voxelize import VoxelGenerator

    vg = cfg.voxel_generator
    gen = VoxelGenerator(vg["voxel_size"], vg["range"],
                         vg["max_points_in_voxel"], max_voxels)
    v, c, n = gen.generate(points.astype(np.float32))

    def pad(a, fill=0):
        out = np.full((max_voxels,) + a.shape[1:], fill, a.dtype)
        out[:len(a)] = a
        return out

    return {
        "voxels": jnp.asarray(pad(v))[None],
        "coordinates": jnp.asarray(pad(c.astype(np.int32), fill=-1))[None],
        "num_points": jnp.asarray(pad(n.astype(np.int32)))[None],
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--input", required=True,
                   help="infos pkl or directory of per-frame pkls")
    p.add_argument("--output", default="detections.pkl")
    p.add_argument("--bf16", action="store_true")
    args = p.parse_args()
    logging.basicConfig(level=logging.INFO)
    logger = logging.getLogger("sparse2dense_tpu")

    import jax

    from ..data.pipelines.loading import get_obj, read_single_waymo

    cfg, model, variables, max_voxels = initialize_model(
        args.config, args.checkpoint, logger)

    @jax.jit
    def infer(variables, batch):
        preds = model.apply(variables, batch, train=False)
        if isinstance(preds, dict) and "preds" in preds:
            return model.predict(preds)
        return model.predict(preds, cfg.test_cfg)

    if os.path.isdir(args.input):
        frame_paths = sorted(glob.glob(os.path.join(args.input, "*.pkl")))
    else:
        with open(args.input, "rb") as f:
            infos = pickle.load(f)
        frame_paths = [i["path"] for i in infos]

    detections = {}
    times = []
    for i, path in enumerate(frame_paths):
        points = read_single_waymo(get_obj(path))
        if args.bf16:
            points = points.astype(np.float32)  # host stays f32; model is bf16-ready
        batch = process_inputs(cfg, points, max_voxels)
        t0 = time.perf_counter()
        out = jax.block_until_ready(infer(variables, batch))
        if i >= 2:
            times.append(time.perf_counter() - t0)
        m = np.asarray(out["valid"][0])
        detections[os.path.basename(path)] = {
            "box3d_lidar": np.asarray(out["box3d_lidar"][0])[m],
            "scores": np.asarray(out["scores"][0])[m],
            "label_preds": np.asarray(out["label_preds"][0])[m],
        }
    if times:
        logger.info(f"mean latency {1000 * np.mean(times):.1f} ms "
                    f"({1 / np.mean(times):.1f} FPS)")
    with open(args.output, "wb") as f:
        pickle.dump(detections, f)
    logger.info(f"wrote {len(detections)} frames to {args.output}")


if __name__ == "__main__":
    main()
