"""Point-cloud loading pipeline stages (host side).

Rebuild of the reference det3d/datasets/pipelines/loading.py:101-199:
Waymo per-frame pickles (xyz + tanh-normalized intensity feature), nuScenes
.bin files, multi-sweep concatenation with per-sweep transform matrices and a
time-lag channel.
"""
from __future__ import annotations

import os
import pickle
from pathlib import Path

import numpy as np


def get_obj(path):
    with open(path, "rb") as f:
        return pickle.load(f)


def read_file(path, num_point_feature=4):
    return np.fromfile(path, dtype=np.float32).reshape(-1, 5)[:, :num_point_feature]


def remove_close(points, radius: float):
    """points (C, N); drop points within ``radius`` of the origin in x and y
    (reference loading.py:34-44)."""
    x_filt = np.abs(points[0, :]) < radius
    y_filt = np.abs(points[1, :]) < radius
    return points[:, ~(x_filt & y_filt)]


def read_single_waymo(obj):
    """(reference loading.py:61-70): tanh intensity, concat xyz + features."""
    points_xyz = obj["lidars"]["points_xyz"]
    points_feature = obj["lidars"]["points_feature"].copy()
    points_feature[:, 0] = np.tanh(points_feature[:, 0])
    return np.concatenate([points_xyz, points_feature], axis=-1)


def read_single_waymo_sweep(sweep):
    obj = get_obj(sweep["path"])
    points_sweep = read_single_waymo(obj).T  # (5, N)
    if sweep["transform_matrix"] is not None:
        n = points_sweep.shape[1]
        points_sweep[:3, :] = sweep["transform_matrix"].dot(
            np.vstack((points_sweep[:3, :], np.ones(n)))
        )[:3, :]
    times = sweep["time_lag"] * np.ones((1, points_sweep.shape[1]))
    return points_sweep.T, times.T


def read_sweep(sweep):
    points_sweep = read_file(str(sweep["lidar_path"])).T
    points_sweep = remove_close(points_sweep, 1.0)
    if sweep["transform_matrix"] is not None:
        n = points_sweep.shape[1]
        points_sweep[:3, :] = sweep["transform_matrix"].dot(
            np.vstack((points_sweep[:3, :], np.ones(n)))
        )[:3, :]
    times = sweep["time_lag"] * np.ones((1, points_sweep.shape[1]))
    return points_sweep.T, times.T


class LoadPointCloudFromFile:
    def __init__(self, dataset="WaymoDataset", **kwargs):
        self.type = dataset

    def __call__(self, res, info):
        res["type"] = self.type
        if self.type == "WaymoDataset":
            nsweeps = res["lidar"]["nsweeps"]
            obj = get_obj(info["path"])
            points = read_single_waymo(obj)
            res["lidar"]["points"] = points
            if nsweeps > 1:
                sweep_points = [points]
                sweep_times = [np.zeros((points.shape[0], 1))]
                for i in range(nsweeps - 1):
                    p, t = read_single_waymo_sweep(info["sweeps"][i])
                    sweep_points.append(p)
                    sweep_times.append(t)
                points = np.concatenate(sweep_points, axis=0)
                times = np.concatenate(sweep_times, axis=0).astype(points.dtype)
                res["lidar"]["points"] = points
                res["lidar"]["times"] = times
                res["lidar"]["combined"] = np.hstack([points, times])
        elif self.type == "NuScenesDataset":
            nsweeps = res["lidar"]["nsweeps"]
            points = read_file(str(Path(info["lidar_path"])))
            sweep_points = [points]
            sweep_times = [np.zeros((points.shape[0], 1))]
            rng = np.random
            for i in rng.choice(len(info["sweeps"]), nsweeps - 1, replace=False):
                p, t = read_sweep(info["sweeps"][i])
                sweep_points.append(p)
                sweep_times.append(t)
            points = np.concatenate(sweep_points, axis=0)
            times = np.concatenate(sweep_times, axis=0).astype(points.dtype)
            res["lidar"]["points"] = points
            res["lidar"]["times"] = times
            res["lidar"]["combined"] = np.hstack([points, times])
        else:
            raise NotImplementedError(self.type)
        return res, info


class LoadPointCloudAnnotations:
    def __init__(self, with_bbox=True, **kwargs):
        pass

    def __call__(self, res, info):
        if res["type"] == "NuScenesDataset" and "gt_boxes" in info:
            gt_boxes = info["gt_boxes"].astype(np.float32)
            gt_boxes[np.isnan(gt_boxes)] = 0
            res["lidar"]["annotations"] = {
                "boxes": gt_boxes,
                "names": info["gt_names"],
                "tokens": info.get("gt_boxes_token"),
                "velocities": info["gt_boxes_velocity"].astype(np.float32),
            }
        elif res["type"] == "WaymoDataset" and "gt_boxes" in info:
            res["lidar"]["annotations"] = {
                "boxes": info["gt_boxes"].astype(np.float32),
                "names": info["gt_names"],
            }
        return res, info
