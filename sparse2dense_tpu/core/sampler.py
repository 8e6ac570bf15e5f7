"""GT-AUG database sampler (host side).

Rebuild of the reference DataBaseSamplerV2 (det3d/core/sampler/sample_ops.py:
49-430) and its BatchSampler/filters (core/sampler/preprocess.py:19-105):
class-balanced sampling of per-object point clouds from a gt database, with a
BEV collision test against scene boxes, and — for distillation — the dense
object-set points of each pasted object returned as ``recon_points``
(sample_ops.py:233-259).

Group sampling (multi-object groups) is not implemented: none of the shipped
Sparse2Dense configs use it (all sample_groups entries are single-class).
"""
from __future__ import annotations

import copy
import os
import pickle
from pathlib import Path
from typing import List, Optional

import numpy as np

from . import box_np_ops


def get_obj(path):
    with open(path, "rb") as f:
        return pickle.load(f)


def pad_box_dims(boxes: np.ndarray, nd: int) -> np.ndarray:
    """Align 7-dof db boxes with a 9-dof (velocity-carrying) scene layout by
    inserting zero velocity before the rotation column."""
    if boxes.shape[-1] >= nd:
        return boxes
    pad = np.zeros((len(boxes), nd - boxes.shape[-1]), boxes.dtype)
    return np.concatenate([boxes[:, :-1], pad, boxes[:, -1:]], axis=-1)


def mirror_vehicle_points(gt_point: np.ndarray) -> np.ndarray:
    """Left/right symmetrization of a vehicle's dense object points
    (reference datasets/pipelines/preprocess.py:90-103)."""
    ind = gt_point[:, 1] > 0
    vind = gt_point[:, 1] < 0
    keep = ind if ind.sum() > vind.sum() else vind
    gt_point = gt_point[keep]
    mirrored = gt_point.copy()
    mirrored[:, 1] *= -1
    return np.concatenate([gt_point, mirrored], 0)


def dense_points_for_box(gt_dir, obj_id, name, box, fallback_points=None):
    """Load the dense object set for one object and place it at its box
    (reference preprocess.py:85-117 / sample_ops.py:233-259). Returns None if
    the object pkl is missing and no fallback is given."""
    path = os.path.join(gt_dir, f"{obj_id}.pkl") if gt_dir else None
    if path and os.path.exists(path):
        gt_point = get_obj(path)["gt"].copy()
        if name == "VEHICLE":
            gt_point = mirror_vehicle_points(gt_point)
        from .augment import rotation_points_single_angle

        gt_point[:, :3] = rotation_points_single_angle(
            gt_point[:, :3], np.pi / 2 + box[-1], axis=2
        )
        gt_point[:, :3] += box[None][:, :3]
        return gt_point
    return fallback_points


class BatchSampler:
    """Epoch-shuffled round-robin sampler over a db-info list
    (reference core/sampler/preprocess.py:19-54)."""

    def __init__(self, sampled_list, name=None, shuffle=True,
                 rng: Optional[np.random.RandomState] = None):
        self._sampled_list = sampled_list
        self._rng = rng or np.random
        self._indices = np.arange(len(sampled_list))
        self._shuffle = shuffle
        if shuffle:
            self._rng.shuffle(self._indices)
        self._idx = 0
        self._n = len(sampled_list)

    def sample(self, num):
        if self._idx + num >= self._n:
            idx = self._indices[self._idx:].copy()
            if self._shuffle:
                self._rng.shuffle(self._indices)
            self._idx = 0
        else:
            idx = self._indices[self._idx:self._idx + num]
            self._idx += num
        return [self._sampled_list[i] for i in idx]


def filter_db_infos(db_infos, db_prep_steps, logger=None):
    """DBFilterByDifficulty / DBFilterByMinNumPoint
    (reference core/sampler/preprocess.py:66-95)."""
    for step in db_prep_steps or []:
        step = dict(step)
        if "filter_by_difficulty" in step:
            removed = step["filter_by_difficulty"]
            db_infos = {
                k: [i for i in v if i.get("difficulty", 0) not in removed]
                for k, v in db_infos.items()
            }
        if "filter_by_min_num_points" in step:
            for name, mn in dict(step["filter_by_min_num_points"]).items():
                if mn > 0 and name in db_infos:
                    db_infos[name] = [
                        i for i in db_infos[name]
                        if i.get("num_points_in_gt", 0) >= mn
                    ]
    return db_infos


class DataBaseSamplerV2:
    def __init__(self, db_infos, groups, db_prep_steps=None, rate=1.0,
                 global_rot_range=None, gt_dir=None, logger=None,
                 rng: Optional[np.random.RandomState] = None):
        self.db_infos = filter_db_infos(db_infos, db_prep_steps, logger)
        self._rate = rate
        self._gt_dir = gt_dir
        self._rng = rng or np.random
        self._sample_classes = []
        self._sample_max_nums = []
        for group in groups:
            if len(group) > 1:
                raise NotImplementedError("group sampling unused by Sparse2Dense")
            self._sample_classes += list(group.keys())
            self._sample_max_nums += list(group.values())
        self._sampler_dict = {
            k: BatchSampler(v, k, rng=self._rng)
            for k, v in self.db_infos.items()
        }

    def sample_class_v2(self, name, num, gt_boxes):
        """Collision-pruned candidate placement (reference sample_ops.py:313-360)."""
        if name not in self._sampler_dict or num <= 0:
            return []
        sampled = copy.deepcopy(self._sampler_dict[name].sample(num))
        if not sampled:
            return []
        num_gt = gt_boxes.shape[0]
        sp_boxes = np.stack([i["box3d_lidar"] for i in sampled], axis=0)
        sp_boxes = pad_box_dims(sp_boxes, gt_boxes.shape[-1])
        for info, b in zip(sampled, sp_boxes):
            info["box3d_lidar"] = b
        boxes = np.concatenate([gt_boxes, sp_boxes], axis=0)
        bv = boxes[:, [0, 1, 3, 4, -1]]
        from .augment import box_collision_test

        coll = box_collision_test(bv, bv)
        np.fill_diagonal(coll, False)
        valid = []
        for i in range(num_gt, num_gt + len(sampled)):
            if coll[i].any():
                coll[i] = False
                coll[:, i] = False
            else:
                valid.append(sampled[i - num_gt])
        return valid

    def sample_all(self, root_path, gt_boxes, gt_names, num_point_features,
                   distillation=False):
        """Returns dict(gt_names, gt_boxes, points, gt_masks, recon_points)
        or None (reference sample_ops.py:140-297)."""
        sampled = []
        sampled_gt_boxes = []
        avoid = gt_boxes
        for class_name, max_num in zip(self._sample_classes, self._sample_max_nums):
            n = int(max_num - np.sum([x == class_name for x in gt_names]))
            n = int(np.round(self._rate * n))
            if n <= 0:
                continue
            cls_sampled = self.sample_class_v2(class_name, n, avoid)
            sampled += cls_sampled
            if cls_sampled:
                boxes = np.stack([s["box3d_lidar"] for s in cls_sampled], axis=0)
                sampled_gt_boxes.append(boxes)
                avoid = np.concatenate([avoid, boxes], axis=0)

        if not sampled:
            return None
        sampled_gt_boxes = np.concatenate(sampled_gt_boxes, axis=0)
        s_points_list, c_points_list = [], []
        for info in sampled:
            s_points = np.fromfile(
                str(Path(root_path) / info["path"]), dtype=np.float32
            ).reshape(-1, num_point_features)
            s_points[:, :3] += info["box3d_lidar"][:3]
            s_points_list.append(s_points)
            if distillation:
                gt_point = dense_points_for_box(
                    self._gt_dir, info.get("gt_signs", ""), info["name"],
                    info["box3d_lidar"],
                )
                if gt_point is None:
                    gt_point = s_points  # no dense set: fall back to raw points
                else:
                    gt_point = gt_point[np.any(
                        box_np_ops.points_in_rbbox(
                            gt_point, info["box3d_lidar"][None]), axis=1)]
                c_points_list.append(gt_point)
        ret = {
            "gt_names": np.array([s["name"] for s in sampled]),
            "difficulty": np.array([s.get("difficulty", 0) for s in sampled]),
            "gt_boxes": sampled_gt_boxes,
            "points": np.concatenate(s_points_list, axis=0),
            "gt_masks": np.ones((len(sampled),), dtype=bool),
        }
        if distillation:
            ret["recon_points"] = np.concatenate(c_points_list, axis=0)
        return ret


def build_dbsampler(cfg, gt_dir=None, logger=None):
    """From the reference db_sampler config schema (type='GT-AUG')."""
    cfg = dict(cfg)
    if not cfg.get("enable", True):
        return None
    info_path = cfg["db_info_path"]
    if not os.path.exists(info_path):
        if logger:
            logger.warning(f"db_info_path {info_path} missing; GT-AUG disabled")
        return None
    with open(info_path, "rb") as f:
        db_infos = pickle.load(f)
    prep_steps = []
    for step in cfg.get("db_prep_steps", []):
        step = dict(step)
        if "filter_by_min_num_point" in step:  # singular alias in some configs
            step["filter_by_min_num_points"] = step.pop("filter_by_min_num_point")
        prep_steps.append(step)
    return DataBaseSamplerV2(
        db_infos,
        cfg["sample_groups"],
        db_prep_steps=prep_steps,
        rate=cfg.get("rate", 1.0),
        global_rot_range=cfg.get("global_random_rotation_range_per_object"),
        gt_dir=gt_dir,
        logger=logger,
    )
