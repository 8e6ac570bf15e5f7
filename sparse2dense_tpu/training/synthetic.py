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
    """LiDAR-like cloud: ground-plane beam rings (contiguous arcs, denser
    near the sensor), surface clusters with vertical extent, and a small
    isolated-return fraction. Spatial statistics matter for the
    sparse-engine benches — a box-uniform cloud has no BEV locality and
    badly overstates active sets at every scale, while over-thin sheets
    overstate strided-conv dilation."""
    lo = np.asarray(pc_range[:3])
    hi = np.asarray(pc_range[3:])
    r_max = float(min(hi[0], hi[1])) * 0.98
    h = -float(lo[2]) * 0.95  # sensor height above the ground plane
    n_g = int(n_points * 0.55)
    n_c = int(n_points * 0.40)
    n_s = n_points - n_g - n_c
    parts = []
    # ground rings from 48 downward beams
    els = np.linspace(np.deg2rad(-18.0), np.deg2rad(-0.5), 48)
    per = max(n_g // 48, 1)
    for el in els:
        r = min(h / np.tan(-el), r_max)
        az = rng.uniform(-np.pi, np.pi, per)
        rr = r * (1 + rng.normal(0, 0.02, per))
        parts.append(np.stack([rr * np.cos(az), rr * np.sin(az),
                               -h + rng.normal(0, 0.04, per)], 1))
    # object / wall / vegetation clusters with vertical extent
    k = 140
    cth = rng.uniform(-np.pi, np.pi, k)
    cr = np.sqrt(rng.uniform(0.01, 1, k)) * r_max * 0.95
    per_c = max(n_c // k, 1)
    for i in range(k):
        sx = rng.uniform(0.5, 4.0)
        sy = rng.uniform(0.5, 4.0)
        sz = rng.uniform(0.5, 2.2)
        parts.append(np.stack(
            [cr[i] * np.cos(cth[i]) + rng.normal(0, sx, per_c),
             cr[i] * np.sin(cth[i]) + rng.normal(0, sy, per_c),
             rng.uniform(-h, -h + sz, per_c)], 1))
    # isolated returns (canopy, noise)
    th = rng.uniform(-np.pi, np.pi, n_s)
    r = np.sqrt(rng.uniform(0.01, 1, n_s)) * r_max * 0.95
    parts.append(np.stack([r * np.cos(th), r * np.sin(th),
                           rng.uniform(lo[2] * 0.75, hi[2] * 0.95, n_s)], 1))
    pts = np.concatenate(parts)[:n_points].astype(np.float32)
    pts = np.clip(pts, lo + 1e-3, hi - 1e-3)
    extra = rng.uniform(0, 1, size=(len(pts), n_feats - 3)).astype(np.float32)
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


def make_gt(rng: np.random.RandomState, n_obj: int, pc_range,
            class_names=("VEHICLE", "PEDESTRIAN", "CYCLIST")):
    lo = np.asarray(pc_range[:3]) * 0.6
    hi = np.asarray(pc_range[3:]) * 0.6
    centers = rng.uniform(lo, hi, size=(n_obj, 3)).astype(np.float32)
    dims = rng.uniform(1.2, 4.5, size=(n_obj, 3)).astype(np.float32)
    vel = np.zeros((n_obj, 2), np.float32)
    rot = rng.uniform(-np.pi, np.pi, size=(n_obj, 1)).astype(np.float32)
    boxes = np.concatenate([centers, dims, vel, rot], axis=1)  # 9-dof layout
    classes = rng.randint(1, len(class_names) + 1, size=n_obj)
    names = np.asarray(list(class_names))[classes - 1]
    return boxes, classes, names


def make_batch(cfg, batch_size: int, max_voxels: int, seed: int = 0,
               n_points: int = 4000, n_obj: int = 8, with_targets: bool = True,
               distillation: bool = False):
    """Build a static-shape batch dict from a reference-schema config.

    With ``distillation``, also emits the dense_* and reconstruction_*{,_2,_4}
    streams the reference Voxelization stage produces when cfg.distillation is
    set (reference datasets/pipelines/preprocess.py:348-412): dense = the same
    cloud with extra in-box points, reconstruction = the cloud voxelized at
    1x/2x/4x voxel size.
    """
    import jax.numpy as jnp

    vg_cfg = cfg["voxel_generator"]
    pc_range = np.asarray(vg_cfg["range"], np.float32)
    gen = VoxelGenerator(
        vg_cfg["voxel_size"], pc_range, vg_cfg["max_points_in_voxel"], max_voxels
    )
    model_cfg = cfg["S_model"]
    if "first_stage_cfg" in model_cfg:  # TwoStageDetector wraps the detector
        model_cfg = model_cfg["first_stage_cfg"]
    n_feats = model_cfg["reader"].get("num_input_features", 5)

    gens_recon = {
        tag: VoxelGenerator(
            [v * mult for v in vg_cfg["voxel_size"]], pc_range,
            vg_cfg["max_points_in_voxel"], max_voxels,
        )
        for tag, mult in (("", 1), ("_2", 2), ("_4", 4))
    } if distillation else {}

    all_vox, all_coords, all_np = [], [], []
    extra = {k: [] for k in
             ("dense_voxels", "dense_coordinates", "dense_num_points")}
    for tag in gens_recon:
        for part in ("voxels", "coordinates", "num_points"):
            extra[f"reconstruction_{part}{tag}"] = []
    targets = []
    for i in range(batch_size):
        rng = np.random.RandomState(seed + i)
        names = tuple(cfg.get("class_names")) if cfg.get("class_names") else \
            ("VEHICLE", "PEDESTRIAN", "CYCLIST")
        gt_boxes, gt_classes, gt_names = make_gt(rng, n_obj, pc_range, names)
        pts = make_points(rng, n_points, pc_range, gt_boxes, n_feats)
        v, c, npts = gen.generate(pts)
        all_vox.append(pad_to(v, max_voxels))
        all_coords.append(pad_to(c, max_voxels, fill=-1))
        all_np.append(pad_to(npts, max_voxels))
        if distillation:
            dense_pts = make_points(rng, n_points // 2, pc_range, gt_boxes, n_feats)
            dense_pts = np.concatenate([pts, dense_pts], axis=0)
            dv, dc, dn = gen.generate(dense_pts)
            extra["dense_voxels"].append(pad_to(dv, max_voxels))
            extra["dense_coordinates"].append(pad_to(dc, max_voxels, fill=-1))
            extra["dense_num_points"].append(pad_to(dn, max_voxels))
            for tag, g in gens_recon.items():
                rv, rc, rn = g.generate(pts)
                extra[f"reconstruction_voxels{tag}"].append(pad_to(rv, max_voxels))
                extra[f"reconstruction_coordinates{tag}"].append(pad_to(rc, max_voxels, fill=-1))
                extra[f"reconstruction_num_points{tag}"].append(pad_to(rn, max_voxels))
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
            head_type = model_cfg["bbox_head"]["type"]
            if head_type == "MultiGroupHead":
                from ..data.pipelines.assign_target import AssignTarget
                assigner = AssignTarget(cfg=cfg["train_cfg"]["assigner"])
            else:
                assigner = AssignLabel(cfg=cfg["train_cfg"]["assigner"])
            res, _ = assigner(res, None)
            targets.append(res["lidar"]["targets"])

    batch = {
        "voxels": jnp.asarray(np.stack(all_vox)),
        "coordinates": jnp.asarray(np.stack(all_coords)),
        "num_points": jnp.asarray(np.stack(all_np)),
    }
    for k, lst in extra.items():
        if lst:
            batch[k] = jnp.asarray(np.stack(lst))
    if with_targets:
        if "hm" in targets[0]:  # CenterHead targets
            n_tasks = len(targets[0]["hm"])
            for key in ("hm", "anno_box", "ind", "mask", "cat"):
                batch[key] = [
                    jnp.asarray(np.stack([t[key][ti] for t in targets]))
                    for ti in range(n_tasks)
                ]
            batch["ind"] = [x.astype(jnp.int32) for x in batch["ind"]]
            batch["cat"] = [x.astype(jnp.int32) for x in batch["cat"]]
            if "gt_boxes_and_cls" in targets[0]:
                batch["gt_boxes_and_cls"] = jnp.asarray(
                    np.stack([t["gt_boxes_and_cls"] for t in targets])
                )
        else:  # MultiGroupHead anchor targets
            n_tasks = len(targets[0]["anchors"])
            for key in ("anchors", "labels", "reg_targets", "reg_weights"):
                batch[key] = [
                    jnp.asarray(np.stack([t[key][ti] for t in targets]))
                    for ti in range(n_tasks)
                ]
            batch["labels"] = [x.astype(jnp.int32) for x in batch["labels"]]
    return batch
