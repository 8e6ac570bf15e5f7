"""nuScenes info creation (reference det3d/datasets/nuscenes/nusc_common.py:
275-505). Requires the nuscenes devkit (external, eval/prep only — the
training path consumes the produced pickles with no devkit dependency).

Each info carries what the loader consumes (data/pipelines/loading.py):
lidar_path, token, sweeps [{lidar_path, transform_matrix, time_lag}],
gt_boxes (N, 9: xyz, wlh, vx, vy, yaw), gt_names, gt_boxes_velocity.
"""
from __future__ import annotations

import pickle
from pathlib import Path

import numpy as np

GENERAL_TO_DETECTION = {
    "human.pedestrian.adult": "pedestrian",
    "human.pedestrian.child": "pedestrian",
    "human.pedestrian.construction_worker": "pedestrian",
    "human.pedestrian.police_officer": "pedestrian",
    "vehicle.car": "car",
    "vehicle.motorcycle": "motorcycle",
    "vehicle.bicycle": "bicycle",
    "vehicle.bus.bendy": "bus",
    "vehicle.bus.rigid": "bus",
    "vehicle.truck": "truck",
    "vehicle.construction": "construction_vehicle",
    "vehicle.trailer": "trailer",
    "movable_object.barrier": "barrier",
    "movable_object.trafficcone": "traffic_cone",
}


def create_nuscenes_infos(root_path, version="v1.0-trainval", nsweeps=10,
                          filter_zero=True):
    from nuscenes import NuScenes
    from nuscenes.utils import splits
    from nuscenes.utils.geometry_utils import transform_matrix
    from pyquaternion import Quaternion

    nusc = NuScenes(version=version, dataroot=root_path, verbose=True)
    scene_splits = {
        "v1.0-trainval": (splits.train, splits.val),
        "v1.0-test": (splits.test, []),
        "v1.0-mini": (splits.mini_train, splits.mini_val),
    }[version]
    test = "test" in version
    name_to_token = {s["name"]: s["token"] for s in nusc.scene}
    train_tokens = {name_to_token[s] for s in scene_splits[0] if s in name_to_token}
    val_tokens = {name_to_token[s] for s in scene_splits[1] if s in name_to_token}

    train_infos, val_infos = [], []
    for sample in nusc.sample:
        ref_sd = nusc.get("sample_data", sample["data"]["LIDAR_TOP"])
        ref_cs = nusc.get("calibrated_sensor", ref_sd["calibrated_sensor_token"])
        ref_pose = nusc.get("ego_pose", ref_sd["ego_pose_token"])
        ref_time = 1e-6 * ref_sd["timestamp"]
        lidar_path, boxes, _ = nusc.get_sample_data(ref_sd["token"])

        ref_from_car = transform_matrix(
            ref_cs["translation"], Quaternion(ref_cs["rotation"]), inverse=True)
        car_from_global = transform_matrix(
            ref_pose["translation"], Quaternion(ref_pose["rotation"]),
            inverse=True)

        info = {"lidar_path": str(lidar_path), "token": sample["token"],
                "timestamp": ref_time, "sweeps": []}

        sd = ref_sd
        while len(info["sweeps"]) < nsweeps - 1:
            if sd["prev"] == "":
                if len(info["sweeps"]) == 0:
                    info["sweeps"].append({
                        "lidar_path": str(lidar_path),
                        "transform_matrix": None, "time_lag": 0.0,
                    })
                else:
                    info["sweeps"].append(info["sweeps"][-1])
                continue
            sd = nusc.get("sample_data", sd["prev"])
            cs = nusc.get("calibrated_sensor", sd["calibrated_sensor_token"])
            pose = nusc.get("ego_pose", sd["ego_pose_token"])
            global_from_car = transform_matrix(
                pose["translation"], Quaternion(pose["rotation"]), inverse=False)
            car_from_current = transform_matrix(
                cs["translation"], Quaternion(cs["rotation"]), inverse=False)
            tm = ref_from_car @ car_from_global @ global_from_car @ car_from_current
            info["sweeps"].append({
                "lidar_path": str(nusc.get_sample_data_path(sd["token"])),
                "transform_matrix": tm,
                "time_lag": ref_time - 1e-6 * sd["timestamp"],
            })

        if not test:
            annotations = [nusc.get("sample_annotation", t) for t in sample["anns"]]
            locs = np.array([b.center for b in boxes]).reshape(-1, 3)
            dims = np.array([b.wlh for b in boxes]).reshape(-1, 3)
            velocity = np.array(
                [nusc.box_velocity(t)[:2] for t in sample["anns"]]
            ).reshape(-1, 2)
            rots = np.array(
                [_quaternion_yaw(b.orientation) for b in boxes]).reshape(-1, 1)
            names = np.array([
                GENERAL_TO_DETECTION.get(b.name, "ignore") for b in boxes])
            gt_boxes = np.concatenate([locs, dims, velocity, rots], axis=1)
            mask = np.array(
                [a["num_lidar_pts"] + a["num_radar_pts"] > 0
                 for a in annotations], dtype=bool,
            ) if filter_zero else np.ones(len(annotations), bool)
            keep = mask & (names != "ignore")
            info["gt_boxes"] = gt_boxes[keep].astype(np.float32)
            info["gt_names"] = names[keep]
            info["gt_boxes_velocity"] = np.concatenate(
                [velocity[keep], np.zeros((keep.sum(), 1))], axis=1
            ).astype(np.float32)
            info["gt_boxes_token"] = np.array(sample["anns"])[keep]

        scene = sample["scene_token"]
        (train_infos if scene in train_tokens else val_infos).append(info)

    root = Path(root_path)
    for split, infos in (("train", train_infos), ("val", val_infos)):
        if not infos:
            continue
        out = root / f"infos_{split}_{nsweeps:02d}sweeps_withvelo_filter_True.pkl"
        with open(out, "wb") as f:
            pickle.dump(infos, f)
        print(f"wrote {len(infos)} {split} infos to {out}")


def _quaternion_yaw(q) -> float:
    import numpy as np

    v = np.dot(q.rotation_matrix, np.array([1.0, 0.0, 0.0]))
    return float(np.arctan2(v[1], v[0]))
