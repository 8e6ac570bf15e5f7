"""WaymoDataset (reference det3d/datasets/waymo/waymo.py:19-108).

Loads pickled per-frame infos, applies ``load_interval`` subsampling
("20% Waymo" = interval 5), and runs the pipeline per frame. Evaluation
writes the Waymo-proto detection bin via waymo_common (metrics are computed
by the external Waymo devkit, same as the reference).
"""
from __future__ import annotations

import pickle
from typing import Optional, Sequence


class WaymoDataset:
    NumPointFeatures = 5  # x, y, z, intensity, elongation

    def __init__(self, info_path, root_path, pipeline=None, class_names=None,
                 test_mode=False, nsweeps=1, load_interval=1, **kwargs):
        self.load_interval = load_interval
        self.nsweeps = nsweeps
        self.test_mode = test_mode
        self._root_path = root_path
        self._info_path = info_path
        self._class_names = class_names
        self._num_point_features = (
            self.NumPointFeatures if nsweeps == 1 else self.NumPointFeatures + 1
        )
        self.pipeline = pipeline
        self._infos = None

    def load_infos(self):
        with open(self._info_path, "rb") as f:
            infos = pickle.load(f)
        self._infos = infos[:: self.load_interval]

    @property
    def infos(self):
        if self._infos is None:
            self.load_infos()
        return self._infos

    def __len__(self):
        return len(self.infos)

    def get_sensor_data(self, idx):
        info = self.infos[idx]
        if "gt_signs" not in info:
            info["gt_signs"] = None
        res = {
            "lidar": {
                "type": "lidar",
                "points": None,
                "annotations": None,
                "nsweeps": self.nsweeps,
                "signs": info["gt_signs"],
            },
            "metadata": {
                "image_prefix": self._root_path,
                "num_point_features": self._num_point_features,
                "token": info["token"],
            },
            "calib": None,
            "cam": {},
            "mode": "val" if self.test_mode else "train",
            "type": "WaymoDataset",
        }
        data, _ = self.pipeline(res, info)
        return data

    def __getitem__(self, idx):
        return self.get_sensor_data(idx)

    def evaluation(self, detections, output_dir=None, testset=False):
        """Write the Waymo-proto detection bin (official metrics come from the
        external devkit binary, reference waymo.py:98-108) AND compute the
        in-repo BEV R40 mAP (core/eval.py) as an immediately available local
        metric — the reference only returns (None, None) here."""
        import numpy as np

        from .waymo_common import _create_pd_detection, reorganize_info
        from ...core.eval import evaluate_detections

        infos = reorganize_info(self.infos)
        _create_pd_detection(detections, infos, output_dir)
        print("detection bin written; use the waymo devkit tool for the "
              "official metric")
        if testset or not self._class_names:
            return None, None
        gts = {}
        for token, info in infos.items():
            boxes = info.get("gt_boxes")
            if boxes is None or len(boxes) == 0:
                continue
            names = np.asarray(info.get("gt_names"))
            classes = np.asarray([
                self._class_names.index(n) + 1 if n in self._class_names else 0
                for n in names])
            sel = classes > 0
            gts[token] = {"gt_boxes": np.asarray(boxes)[sel],
                          "gt_classes": classes[sel]}
        if not gts:
            return None, None
        res = evaluate_detections(gts, detections, list(self._class_names))
        summary = ", ".join(
            f"{k}: {v['ap']:.4f}" for k, v in res.items()
            if isinstance(v, dict) and "ap" in v)
        return {"local_bev_mAP": res.get("mAP"), "per_class": res,
                "results": summary}, None
