"""Waymo detection-bin emission (reference det3d/datasets/waymo/
waymo_common.py:57-120).

Writes the official ``metrics_pb2.Objects`` proto bin when the Waymo devkit
is importable; otherwise falls back to pickling the detections (the devkit is
an external eval-only dependency, same as in the reference where metrics are
computed by its separate compute_detection_metrics_main tool).
"""
from __future__ import annotations

import os
import pickle

import numpy as np

LABEL_TO_TYPE = {0: 1, 1: 2, 2: 4}  # VEHICLE, PEDESTRIAN, CYCLIST


def reorganize_info(infos):
    return {info["token"]: info for info in infos}


def _np(x):
    return np.asarray(x)


def _create_pd_detection(detections, infos, result_path, tracking=False):
    try:
        from waymo_open_dataset import label_pb2
        from waymo_open_dataset.protos import metrics_pb2
    except ImportError:
        out = os.path.join(result_path, "detection_pred.pkl")
        with open(out, "wb") as f:
            pickle.dump(detections, f)
        print(f"waymo devkit unavailable; wrote pickle fallback to {out}")
        return

    objects = metrics_pb2.Objects()
    for token, detection in detections.items():
        info = infos[token]
        anno = info["anno"] if "anno" in info else info
        box3d = _np(detection["box3d_lidar"])
        scores = _np(detection["scores"])
        labels = _np(detection["label_preds"])
        for i in range(box3d.shape[0]):
            det = box3d[i]
            o = metrics_pb2.Object()
            o.context_name = anno["scene_name"] if "scene_name" in anno else info["context"]
            o.frame_timestamp_micros = int(
                anno.get("frame_id", info.get("timestamp", 0))
            )
            box = label_pb2.Label.Box()
            box.center_x, box.center_y, box.center_z = map(float, det[:3])
            box.width, box.length, box.height = map(float, det[3:6])
            box.heading = float(det[-1])
            o.object.box.CopyFrom(box)
            o.score = float(scores[i])
            o.object.type = LABEL_TO_TYPE[int(labels[i])]
            objects.objects.append(o)

    path = os.path.join(
        result_path, "tracking_pred.bin" if tracking else "detection_pred.bin"
    )
    with open(path, "wb") as f:
        f.write(objects.SerializeToString())
    print(f"wrote waymo detection bin to {path}")
