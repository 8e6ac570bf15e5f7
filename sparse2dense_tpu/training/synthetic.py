"""Synthetic data generation for smoke tests, graft entries and benches.

Generates a random point cloud with a few planted box "objects", voxelizes it
with the parity voxelizer, pads to static budgets, and builds AssignLabel
targets — a full training batch with no dataset on disk.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from ..ops.voxelize import VoxelGenerator
from ..data.pipelines.assign_label import AssignLabel


def pad_to(a: np.ndarray, n: int, fill=0):
    out = np.full((n,) + a.shape[1:], fill, a.dtype)
    m = min(len(a), n)
    out[:m] = a[:m]
    return out


def make_points(rng: np.random.RandomState, n_points: int, pc_range,
                gt_boxes: Optional[np.ndarray] = None, n_feats: int = 5):
    lo = np.asarray(pc_range[:3])
    hi = np.asarray(pc_range[3:])
    pts = rng.uniform(lo, hi, size=(n_points, 3)).astype(np.float32)
    extra = rng.uniform(0, 1, size=(n_points, n_feats - 3)).astype(np.float32)
    pts = np.concatenate([pts, extra], axis=1)
    if gt_boxes is not None:
        # drop a clump of points inside each box so objects are learnable
        clumps = []
        for b in gt_boxes:
            c = b[:3] + rng.normal(0, 0.2, size=(64, 3)) * b[3:6] * 0.25
            clumps.append(
                np.concatenate(
                    [c.astype(np.float32),
                     rng.uniform(0, 1, size=(64, n_feats - 3)).astype(np.float32)],
                    axis=1,
                )
            )
        pts = np.concatenate([pts] + clumps, axis=0)
    return pts


def make_gt(rng: np.random.RandomState, n_obj: int, pc_range):
    lo = np.asarray(pc_range[:3]) * 0.6
    hi = np.asarray(pc_range[3:]) * 0.6
    centers = rng.uniform(lo, hi, size=(n_obj, 3)).astype(np.float32)
    dims = rng.uniform(1.2, 4.5, size=(n_obj, 3)).astype(np.float32)
    vel = np.zeros((n_obj, 2), np.float32)
    rot = rng.uniform(-np.pi, np.pi, size=(n_obj, 1)).astype(np.float32)
    boxes = np.concatenate([centers, dims, vel, rot], axis=1)  # 9-dof waymo layout
    classes = rng.randint(1, 4, size=n_obj)
    names = np.array(["VEHICLE", "PEDESTRIAN", "CYCLIST"])[classes - 1]
    return boxes, classes, names


def make_batch(cfg, batch_size: int, max_voxels: int, seed: int = 0,
               n_points: int = 4000, n_obj: int = 8, with_targets: bool = True):
    """Build a static-shape batch dict from a reference-schema config."""
    import jax.numpy as jnp

    vg_cfg = cfg["voxel_generator"]
    pc_range = np.asarray(vg_cfg["range"], np.float32)
    gen = VoxelGenerator(
        vg_cfg["voxel_size"], pc_range, vg_cfg["max_points_in_voxel"], max_voxels
    )
    n_feats = cfg["S_model"]["reader"].get("num_input_features", 5)

    all_vox, all_coords, all_np = [], [], []
    targets = []
    for i in range(batch_size):
        rng = np.random.RandomState(seed + i)
        gt_boxes, gt_classes, gt_names = make_gt(rng, n_obj, pc_range)
        pts = make_points(rng, n_points, pc_range, gt_boxes, n_feats)
        v, c, npts = gen.generate(pts)
        all_vox.append(pad_to(v, max_voxels))
        all_coords.append(pad_to(c, max_voxels, fill=-1))
        all_np.append(pad_to(npts, max_voxels))
        if with_targets:
            res = {
                "mode": "train",
                "type": "WaymoDataset",
                "lidar": {
                    "voxels": {
                        "shape": gen.grid_size,
                        "range": pc_range,
                        "size": np.asarray(vg_cfg["voxel_size"], np.float32),
                    },
                    "annotations": {
                        "gt_boxes": gt_boxes,
                        "gt_classes": gt_classes,
                        "gt_names": gt_names,
                    },
                },
            }
            assigner = AssignLabel(cfg=cfg["train_cfg"]["assigner"])
            res, _ = assigner(res, None)
            targets.append(res["lidar"]["targets"])

    batch = {
        "voxels": jnp.asarray(np.stack(all_vox)),
        "coordinates": jnp.asarray(np.stack(all_coords)),
        "num_points": jnp.asarray(np.stack(all_np)),
    }
    if with_targets:
        n_tasks = len(targets[0]["hm"])
        for key in ("hm", "anno_box", "ind", "mask", "cat"):
            batch[key] = [
                jnp.asarray(np.stack([t[key][ti] for t in targets]))
                for ti in range(n_tasks)
            ]
        batch["ind"] = [x.astype(jnp.int32) for x in batch["ind"]]
        batch["cat"] = [x.astype(jnp.int32) for x in batch["cat"]]
    return batch
