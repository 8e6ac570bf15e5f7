"""NuScenesDataset (reference det3d/datasets/nuscenes/nuscenes.py:30-327).

Info-pkl driven; evaluation converts fixed-size masked detections to the
nuScenes result json and runs the devkit's eval_main when importable
(the reference calls nusc_common.eval_main, nuscenes.py:230-296).
"""
from __future__ import annotations

import json
import os
import pickle

import numpy as np


class NuScenesDataset:
    NumPointFeatures = 5  # x, y, z, intensity, ring -> 4 used + time

    DefaultAttribute = {
        "car": "vehicle.parked",
        "pedestrian": "pedestrian.moving",
        "trailer": "vehicle.parked",
        "truck": "vehicle.parked",
        "bus": "vehicle.moving",
        "motorcycle": "cycle.without_rider",
        "construction_vehicle": "vehicle.parked",
        "bicycle": "cycle.without_rider",
        "barrier": "",
        "traffic_cone": "",
    }

    def __init__(self, info_path, root_path, pipeline=None, class_names=None,
                 test_mode=False, nsweeps=1, load_interval=1, version="v1.0-trainval",
                 **kwargs):
        self._info_path = info_path
        self._root_path = root_path
        self._class_names = class_names
        self.test_mode = test_mode
        self.nsweeps = nsweeps
        self.load_interval = load_interval
        self.version = version
        self.pipeline = pipeline
        self._infos = None
        self._num_point_features = 4

    @property
    def infos(self):
        if self._infos is None:
            with open(self._info_path, "rb") as f:
                infos = pickle.load(f)
            if isinstance(infos, dict):  # some info pkls store {"infos": ...}
                infos = infos.get("infos", infos)
            self._infos = infos[:: self.load_interval]
        return self._infos

    def __len__(self):
        return len(self.infos)

    def get_sensor_data(self, idx):
        info = self.infos[idx]
        res = {
            "lidar": {
                "type": "lidar",
                "points": None,
                "annotations": None,
                "nsweeps": self.nsweeps,
            },
            "metadata": {
                "image_prefix": self._root_path,
                "num_point_features": self._num_point_features,
                "token": info["token"],
            },
            "calib": None,
            "cam": {},
            "mode": "val" if self.test_mode else "train",
            "type": "NuScenesDataset",
            "painted": False,
        }
        data, _ = self.pipeline(res, info)
        return data

    def __getitem__(self, idx):
        return self.get_sensor_data(idx)

    def evaluation(self, detections, output_dir=None, testset=False):
        """Write nusc-format results json; run devkit eval when available."""
        nusc_annos = {"results": {}, "meta": {"use_camera": False,
                                              "use_lidar": True,
                                              "use_radar": False,
                                              "use_map": False,
                                              "use_external": False}}
        for token, det in detections.items():
            boxes = np.asarray(det["box3d_lidar"])
            scores = np.asarray(det["scores"])
            labels = np.asarray(det["label_preds"])
            valid = np.asarray(det.get("valid", np.ones(len(scores), bool)))
            annos = []
            for i in np.where(valid)[0]:
                name = self._class_names[int(labels[i])]
                vel = boxes[i, 6:8].tolist() if boxes.shape[-1] > 7 else [0.0, 0.0]
                annos.append({
                    "sample_token": token,
                    "translation": boxes[i, :3].tolist(),
                    "size": boxes[i, 3:6].tolist(),
                    "rotation": _yaw_to_quaternion(float(boxes[i, -1])),
                    "velocity": vel,
                    "detection_name": name,
                    "detection_score": float(scores[i]),
                    "attribute_name": self.DefaultAttribute.get(name, ""),
                })
            nusc_annos["results"][token] = annos

        os.makedirs(output_dir or ".", exist_ok=True)
        res_path = os.path.join(output_dir or ".", "infos_pred_nusc.json")
        with open(res_path, "w") as f:
            json.dump(nusc_annos, f)
        try:
            from nuscenes import NuScenes  # noqa: F401
        except ImportError:
            print(f"nuscenes devkit unavailable; wrote results to {res_path}")
            return None, None
        from .nusc_eval import eval_main

        return eval_main(self._root_path, self.version, res_path, "val",
                         output_dir), None


def _yaw_to_quaternion(yaw: float):
    """Rotation about z by yaw - pi/2 (nusc global-frame convention used by
    the reference's _lidar_nusc_box_to_global path)."""
    import math

    half = yaw / 2
    return [math.cos(half), 0.0, 0.0, math.sin(half)]
