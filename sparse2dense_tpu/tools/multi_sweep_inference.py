"""Multi-sweep streaming inference (reference tools/multi_sweep_inference.py).

Maintains a deque of the last N sweeps, motion-compensates each into the
current vehicle frame using per-frame poses (the reference does this with
cupy + ROS odometry; here plain NumPy + the per-frame ``veh_to_global`` pose
from the decoded pickles), concatenates with a time-lag channel, and runs the
jitted detector.

CLI: python -m sparse2dense_tpu.tools.multi_sweep_inference <config.py>
     --input <dir of frame pkls> [--checkpoint C] [--nsweeps 5]
     [--output detections.pkl]
"""
from __future__ import annotations

import argparse
import glob
import logging
import os
import pickle
from collections import deque

import numpy as np


def transform_points(points, tm):
    """(N, >=3) points through a 4x4 transform."""
    xyz1 = np.concatenate(
        [points[:, :3], np.ones((len(points), 1), points.dtype)], axis=1
    )
    out = points.copy()
    out[:, :3] = (xyz1 @ tm.T)[:, :3]
    return out


class SweepBuffer:
    def __init__(self, nsweeps):
        self.nsweeps = nsweeps
        self.buf = deque(maxlen=nsweeps)  # (points, pose, time)

    def push(self, points, veh_to_global, timestamp):
        self.buf.appendleft((points, veh_to_global, timestamp))

    def combined(self):
        """All sweeps in the newest frame's vehicle coordinates + time lag."""
        points, ref_pose, ref_time = self.buf[0]
        ref_from_global = np.linalg.inv(ref_pose)
        out = [np.concatenate(
            [points, np.zeros((len(points), 1), points.dtype)], axis=1)]
        for pts, pose, t in list(self.buf)[1:]:
            tm = ref_from_global @ pose
            moved = transform_points(pts, tm)
            lag = np.full((len(pts), 1), ref_time - t, pts.dtype)
            out.append(np.concatenate([moved, lag], axis=1))
        return np.concatenate(out, axis=0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--input", required=True)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--nsweeps", type=int, default=5)
    p.add_argument("--output", default="detections.pkl")
    args = p.parse_args()
    logging.basicConfig(level=logging.INFO)
    logger = logging.getLogger("sparse2dense_tpu")

    from ..utils.platform import enforce_platform_from_env

    enforce_platform_from_env()

    import jax

    from .simple_inference import initialize_model, process_inputs
    from ..data.pipelines.loading import get_obj, read_single_waymo

    cfg, model, variables, max_voxels = initialize_model(
        args.config, args.checkpoint, logger)

    @jax.jit
    def infer(variables, batch):
        preds = model.apply(variables, batch, train=False)
        if isinstance(preds, dict) and "preds" in preds:
            return model.predict(preds)
        return model.predict(preds, cfg.test_cfg)

    buf = SweepBuffer(args.nsweeps)
    detections = {}
    for path in sorted(glob.glob(os.path.join(args.input, "*.pkl"))):
        obj = get_obj(path)
        points = read_single_waymo(obj)
        pose = np.reshape(np.asarray(obj.get("veh_to_global", np.eye(4))),
                          (4, 4))
        ts = 1e-6 * int(obj.get("frame_name", "0_0").split("_")[-1]) \
            if "frame_name" in obj else 0.0
        buf.push(points, pose, ts)
        combined = buf.combined()
        batch = process_inputs(cfg, combined, max_voxels)
        out = jax.block_until_ready(infer(variables, batch))
        m = np.asarray(out["valid"][0])
        detections[os.path.basename(path)] = {
            "box3d_lidar": np.asarray(out["box3d_lidar"][0])[m],
            "scores": np.asarray(out["scores"][0])[m],
            "label_preds": np.asarray(out["label_preds"][0])[m],
        }
    with open(args.output, "wb") as f:
        pickle.dump(detections, f)
    logger.info(f"wrote {len(detections)} frames to {args.output}")


if __name__ == "__main__":
    main()
