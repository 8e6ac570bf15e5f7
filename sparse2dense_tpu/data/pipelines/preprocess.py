"""Preprocess and Voxelization pipeline stages (host side).

Rebuild of the reference det3d/datasets/pipelines/preprocess.py:38-463.

``Preprocess`` is where the Sparse2Dense data synthesis happens
(reference :59-272):
- train + distillation: every annotated object's raw points are replaced by
  its *dense object set* points (loaded from ``<gt_dir>/<obj_id>.pkl``,
  vehicles left/right mirrored, rotated from canonical to box frame) to form
  ``dense_points``; the same per-object points restricted to their boxes form
  ``reconstruction_points``;
- GT-AUG paste (db_sampler) extends all three streams coherently;
- global flip/rotation/scaling/translation transform all three streams with
  the same random draw (the reference's ``*_`` function family).

``Voxelization`` (reference :276-463) emits the base voxel stream plus — for
distillation — dense voxels and reconstruction voxels at 1x/2x/4x voxel size.
"""
from __future__ import annotations

import os

import numpy as np

from ...core import augment, box_np_ops
from ...core.sampler import build_dbsampler, dense_points_for_box
from ...ops.voxelize import VoxelGenerator


def _dict_select(d, inds):
    for k, v in d.items():
        if isinstance(v, dict):
            _dict_select(v, inds)
        else:
            d[k] = v[inds]


def drop_arrays_by_name(gt_names, used_classes):
    inds = [i for i, x in enumerate(gt_names) if x not in used_classes]
    return np.array(inds, dtype=np.int64)


def synthesize_dense_streams(points, info, gt_dir):
    """Build (dense_points, reconstruction_points) for one frame
    (reference preprocess.py:81-117 train / :216-254 val)."""
    gt_boxes = info["gt_boxes"]
    point_out_box = ~np.any(box_np_ops.points_in_rbbox(points, gt_boxes), axis=1)
    combined = [points[point_out_box]]
    recon = []
    for obj, box, typ in zip(info["gt_signs"], gt_boxes, info["gt_names"]):
        gt_point = None
        if typ != "SIGN":
            gt_point = dense_points_for_box(gt_dir, obj, typ, box)
        if gt_point is None:
            gt_point = points[box_np_ops.points_in_rbbox(points, box[None])[:, 0]]
        combined.append(gt_point)
        if typ != "SIGN":
            recon.append(gt_point)
    dense_points = np.concatenate(combined, 0)
    if len(recon) == 0:
        recon_points = np.zeros([1, points.shape[1]], points.dtype)
    else:
        recon_points = np.concatenate(recon, 0)
        recon_points = recon_points[
            np.any(box_np_ops.points_in_rbbox(recon_points, gt_boxes), axis=1)
        ]
    return dense_points, recon_points


class Preprocess:
    def __init__(self, cfg=None, **kwargs):
        cfg = cfg if cfg is not None else kwargs["cfg"]
        cfg = dict(cfg)
        self.shuffle_points = cfg["shuffle_points"]
        self.min_points_in_gt = cfg.get("min_points_in_gt", -1)
        self.distillation = cfg.get("distillation", False)
        self.mode = cfg["mode"]
        self.no_augmentation = cfg.get("no_augmentation", False)
        # dense object set directory; reference hardcodes
        # '../data/waymo/{train,val}/gt/' (preprocess.py:88, :222)
        self.gt_dir = cfg.get("gt_dir")
        if self.mode == "train":
            self.global_rotation_noise = cfg["global_rot_noise"]
            self.global_scaling_noise = cfg["global_scale_noise"]
            self.global_translate_std = cfg.get("global_translate_std", 0)
            self.class_names = cfg["class_names"]
            self.db_sampler = (
                build_dbsampler(cfg["db_sampler"], gt_dir=self.gt_dir)
                if cfg.get("db_sampler") else None
            )

    def _gt_dir(self, res):
        if self.gt_dir is not None:
            return self.gt_dir
        root = res.get("metadata", {}).get("image_prefix", "../data/waymo")
        sub = "train" if self.mode == "train" else "val"
        return os.path.join(str(root), sub, "gt")

    def __call__(self, res, info):
        res["mode"] = self.mode

        if res["type"] == "WaymoDataset":
            points = res["lidar"].get("combined", res["lidar"]["points"])
        elif res["type"] == "NuScenesDataset":
            points = res["lidar"]["combined"]
        else:
            raise NotImplementedError(res["type"])

        dense_points = recon_points = None
        if self.mode == "train":
            anno = res["lidar"]["annotations"]
            gt_dict = {
                "gt_boxes": anno["boxes"],
                "gt_names": np.array(anno["names"]).reshape(-1),
            }
            if self.distillation:
                dense_points, recon_points = synthesize_dense_streams(
                    points, info, self._gt_dir(res)
                )

        if self.mode == "train" and not self.no_augmentation:
            selected = drop_arrays_by_name(
                gt_dict["gt_names"], ["DontCare", "ignore", "UNKNOWN"]
            )
            _dict_select(gt_dict, selected)

            if self.min_points_in_gt > 0:
                counts = box_np_ops.points_in_rbbox(
                    points, gt_dict["gt_boxes"]
                ).sum(0)
                _dict_select(gt_dict, counts >= self.min_points_in_gt)

            gt_boxes_mask = np.array(
                [n in self.class_names for n in gt_dict["gt_names"]], dtype=bool
            )

            if self.db_sampler:
                sampled = self.db_sampler.sample_all(
                    res["metadata"]["image_prefix"],
                    gt_dict["gt_boxes"],
                    gt_dict["gt_names"],
                    res["metadata"]["num_point_features"],
                    distillation=self.distillation,
                )
                if sampled is not None:
                    gt_dict["gt_names"] = np.concatenate(
                        [gt_dict["gt_names"], sampled["gt_names"]], axis=0
                    )
                    gt_dict["gt_boxes"] = np.concatenate(
                        [gt_dict["gt_boxes"], sampled["gt_boxes"]]
                    )
                    gt_boxes_mask = np.concatenate(
                        [gt_boxes_mask, sampled["gt_masks"]], axis=0
                    )
                    points = np.concatenate([sampled["points"], points], axis=0)
                    if self.distillation:
                        dense_points = np.concatenate(
                            [sampled["points"], dense_points], axis=0
                        )
                        recon_points = np.concatenate(
                            [sampled["recon_points"], recon_points], axis=0
                        )

            _dict_select(gt_dict, gt_boxes_mask)
            gt_dict["gt_classes"] = np.array(
                [self.class_names.index(n) + 1 for n in gt_dict["gt_names"]],
                dtype=np.int32,
            )

            streams = [points]
            if self.distillation:
                streams += [dense_points, recon_points]
            gt_dict["gt_boxes"], streams = augment.random_flip_both(
                gt_dict["gt_boxes"], streams
            )
            gt_dict["gt_boxes"], streams = augment.global_rotation(
                gt_dict["gt_boxes"], streams, rotation=self.global_rotation_noise
            )
            gt_dict["gt_boxes"], streams = augment.global_scaling(
                gt_dict["gt_boxes"], streams, *self.global_scaling_noise
            )
            gt_dict["gt_boxes"], streams = augment.global_translate(
                gt_dict["gt_boxes"], streams,
                noise_translate_std=self.global_translate_std,
            )
            points = streams[0]
            if self.distillation:
                dense_points, recon_points = streams[1], streams[2]
        elif self.mode == "train" and self.no_augmentation:
            gt_boxes_mask = np.array(
                [n in self.class_names for n in gt_dict["gt_names"]], dtype=bool
            )
            _dict_select(gt_dict, gt_boxes_mask)
            gt_dict["gt_classes"] = np.array(
                [self.class_names.index(n) + 1 for n in gt_dict["gt_names"]],
                dtype=np.int32,
            )
        elif self.mode != "train" and self.distillation:
            dense_points, recon_points = synthesize_dense_streams(
                points, info, self._gt_dir(res)
            )

        if self.shuffle_points:
            np.random.shuffle(points)
            if dense_points is not None:
                np.random.shuffle(dense_points)

        res["lidar"]["points"] = points
        if self.distillation and dense_points is not None:
            res["lidar"]["dense_points"] = dense_points
            res["lidar"]["reconstruction_points"] = recon_points
        if self.mode == "train":
            res["lidar"]["annotations"] = gt_dict
        return res, info


def filter_gt_box_outside_range(gt_boxes, bv_range):
    mask = (
        (gt_boxes[:, 0] >= bv_range[0]) & (gt_boxes[:, 0] <= bv_range[2])
        & (gt_boxes[:, 1] >= bv_range[1]) & (gt_boxes[:, 1] <= bv_range[3])
    )
    return mask


class DoubleFlip:
    """TTA stage (reference datasets/pipelines/test_aug.py): emit y-flipped,
    x-flipped and double-flipped copies of the point cloud for 4-way
    test-time augmentation."""

    def __init__(self, **kwargs):
        pass

    def __call__(self, res, info):
        points = res["lidar"]["points"].copy()
        yflip = points.copy()
        yflip[:, 1] = -yflip[:, 1]
        xflip = points.copy()
        xflip[:, 0] = -xflip[:, 0]
        double = points.copy()
        double[:, :2] = -double[:, :2]
        res["lidar"]["yflip_points"] = yflip
        res["lidar"]["xflip_points"] = xflip
        res["lidar"]["double_flip_points"] = double
        return res, info


class Voxelization:
    def __init__(self, cfg=None, **kwargs):
        cfg = dict(cfg if cfg is not None else kwargs["cfg"])
        if "distillation" in kwargs and kwargs["distillation"] is not None:
            cfg["distillation"] = kwargs["distillation"]
        self.range = np.asarray(cfg["range"], np.float32)
        self.voxel_size = np.asarray(cfg["voxel_size"], np.float32)
        self.max_points_in_voxel = cfg["max_points_in_voxel"]
        mv = cfg["max_voxel_num"]
        self.max_voxel_num = [mv, mv] if isinstance(mv, int) else list(mv)
        self.distillation = cfg.get("distillation", False)
        self.double_flip = cfg.get("double_flip", False)

        def gen(mult):
            return VoxelGenerator(
                self.voxel_size * mult, self.range, self.max_points_in_voxel,
                self.max_voxel_num[0],
            )

        self.voxel_generator = gen(1)
        if self.distillation:
            self.voxel_generator_recon = {"": gen(1), "_2": gen(2), "_4": gen(4)}

    def _pack(self, voxels, coordinates, num_points):
        return dict(
            voxels=voxels,
            coordinates=coordinates,
            num_points=num_points,
            num_voxels=np.array([voxels.shape[0]], dtype=np.int64),
            shape=self.voxel_generator.grid_size,
            range=self.voxel_generator.point_cloud_range,
            size=self.voxel_generator.voxel_size,
        )

    def __call__(self, res, info):
        if res["mode"] == "train":
            gt_dict = res["lidar"]["annotations"]
            bv_range = self.range[[0, 1, 3, 4]]
            mask = filter_gt_box_outside_range(gt_dict["gt_boxes"], bv_range)
            _dict_select(gt_dict, mask)
            res["lidar"]["annotations"] = gt_dict
            max_voxels = self.max_voxel_num[0]
        else:
            max_voxels = self.max_voxel_num[1]

        res["lidar"]["voxels"] = self._pack(
            *self.voxel_generator.generate(res["lidar"]["points"], max_voxels)
        )
        if self.distillation:
            res["lidar"]["dense_voxels"] = self._pack(
                *self.voxel_generator.generate(
                    res["lidar"]["dense_points"], max_voxels)
            )
            recon = res["lidar"]["reconstruction_points"].astype(np.float32)
            for tag, g in self.voxel_generator_recon.items():
                res["lidar"][f"reconstruction_voxels{tag}"] = self._pack(
                    *g.generate(recon, max_voxels)
                )
        if self.double_flip and res["mode"] != "train":
            for key in ("yflip", "xflip", "double_flip"):
                res["lidar"][f"{key}_voxels"] = self._pack(
                    *self.voxel_generator.generate(
                        res["lidar"][f"{key}_points"], max_voxels)
                )
        return res, info
