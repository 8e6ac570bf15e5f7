"""The file-layout-coupled distillation data plumbing (SURVEY hard part #5):
dense object-set pkls + GT-AUG database on disk -> Preprocess synthesizes
coherent dense/reconstruction streams and pastes sampled objects into all
three streams."""
import os
import pickle

import numpy as np

from sparse2dense_tpu.core import box_np_ops
from sparse2dense_tpu.core.sampler import build_dbsampler, dense_points_for_box
from sparse2dense_tpu.data.pipelines.preprocess import Preprocess, Voxelization
from sparse2dense_tpu.data.pipelines.formating import Reformat

CLASSES = ["VEHICLE", "PEDESTRIAN", "CYCLIST"]


def _write_gt_objects(gt_dir, obj_ids, rng, n=80):
    """Canonical-frame dense object sets (<gt_dir>/<id>.pkl with key 'gt',
    the layout the reference loads at preprocess.py:88)."""
    os.makedirs(gt_dir, exist_ok=True)
    for oid in obj_ids:
        pts = rng.normal(0, 0.3, size=(n, 3)).astype(np.float32)
        pts[:, 2] = np.abs(pts[:, 2]) * 0.5
        feats = rng.uniform(0, 1, size=(n, 2)).astype(np.float32)
        with open(os.path.join(gt_dir, f"{oid}.pkl"), "wb") as f:
            pickle.dump({"gt": np.concatenate([pts, feats], 1)}, f)


def _write_db(root, rng, n_objs=6):
    """GT-AUG database: per-object point bins + dbinfos pkl."""
    db_dir = os.path.join(root, "gt_database_1sweeps_withvelo")
    os.makedirs(db_dir, exist_ok=True)
    infos = {c: [] for c in CLASSES}
    for i in range(n_objs):
        name = CLASSES[i % 3]
        pts = rng.normal(0, 0.3, size=(30, 5)).astype(np.float32)
        fname = f"obj_{i}.bin"
        pts.tofile(os.path.join(db_dir, fname))
        box = np.array([rng.uniform(-6, 6), rng.uniform(-6, 6), 0.5,
                        1.8, 3.9, 1.6, rng.uniform(-np.pi, np.pi)], np.float32)
        infos[name].append({
            "name": name,
            "path": os.path.join("gt_database_1sweeps_withvelo", fname),
            "gt_signs": f"dbobj_{i}",
            "box3d_lidar": box,
            "num_points_in_gt": 30,
            "difficulty": 0,
        })
    info_path = os.path.join(root, "dbinfos_train_1sweeps_withvelo.pkl")
    with open(info_path, "wb") as f:
        pickle.dump(infos, f)
    return info_path


def test_dense_object_loading_and_mirroring(tmp_path, rng):
    gt_dir = str(tmp_path / "gt")
    _write_gt_objects(gt_dir, ["veh_1"], rng)
    box = np.array([3.0, -2.0, 0.5, 2.0, 4.5, 1.7, 0.3], np.float32)
    pts = dense_points_for_box(gt_dir, "veh_1", "VEHICLE", box)
    assert pts is not None and len(pts) >= 80  # mirrored: >= original count
    # mirrored cloud is y-symmetric in the box frame: centroid ~ box center in y
    assert abs(pts[:, 1].mean() - box[1]) < 0.3
    # missing object -> None (caller falls back to raw points)
    assert dense_points_for_box(gt_dir, "missing", "VEHICLE", box) is None


def test_preprocess_distillation_with_gtaug(tmp_path, rng):
    root = str(tmp_path)
    gt_dir = os.path.join(root, "train", "gt")
    obj_ids = ["o1", "o2"]
    _write_gt_objects(gt_dir, obj_ids + [f"dbobj_{i}" for i in range(6)], rng)
    db_info_path = _write_db(root, rng)

    gt_boxes = np.array([
        [2.0, 2.0, 0.5, 1.9, 4.4, 1.6, 0.0, 0.0, 0.2],
        [-3.0, -1.0, 0.4, 0.8, 0.9, 1.7, 0.0, 0.0, -0.5],
    ], np.float32)
    gt_names = np.array(["VEHICLE", "PEDESTRIAN"])
    points = rng.uniform(-7, 7, size=(1500, 3)).astype(np.float32)
    points = np.concatenate(
        [points, rng.uniform(0, 1, size=(1500, 2)).astype(np.float32)], 1)

    db_sampler_cfg = dict(
        type="GT-AUG", enable=True, db_info_path=db_info_path,
        sample_groups=[dict(VEHICLE=4), dict(PEDESTRIAN=3), dict(CYCLIST=3)],
        db_prep_steps=[dict(filter_by_min_num_points=dict(
            VEHICLE=5, PEDESTRIAN=5, CYCLIST=5)), dict(filter_by_difficulty=[-1])],
        global_random_rotation_range_per_object=[0, 0], rate=1.0,
    )
    pre = Preprocess(cfg=dict(
        mode="train", shuffle_points=False,
        global_rot_noise=[-0.1, 0.1], global_scale_noise=[0.98, 1.02],
        db_sampler=db_sampler_cfg, class_names=CLASSES, distillation=True,
        gt_dir=gt_dir,
    ))
    res = {
        "lidar": {"type": "lidar", "points": points,
                  "annotations": {"boxes": gt_boxes, "names": gt_names},
                  "nsweeps": 1},
        "metadata": {"image_prefix": root, "num_point_features": 5},
        "type": "WaymoDataset",
        "mode": "train",
    }
    info = {"gt_boxes": gt_boxes, "gt_names": gt_names, "gt_signs": obj_ids}
    res, _ = pre(res, info)

    assert "dense_points" in res["lidar"] and "reconstruction_points" in res["lidar"]
    gt = res["lidar"]["annotations"]
    assert len(gt["gt_boxes"]) > 2  # GT-AUG pasted objects
    # reconstruction points live inside (augmented) gt boxes
    recon = res["lidar"]["reconstruction_points"]
    boxes7 = gt["gt_boxes"][:, [0, 1, 2, 3, 4, 5, -1]]
    inside = box_np_ops.points_in_rbbox(recon[:, :3], boxes7).any(1)
    assert inside.mean() > 0.7
    # dense stream is denser inside boxes than the raw stream
    dense = res["lidar"]["dense_points"]
    n_dense_in = box_np_ops.points_in_rbbox(dense[:, :3], boxes7).any(1).sum()
    n_raw_in = box_np_ops.points_in_rbbox(
        res["lidar"]["points"][:, :3], boxes7).any(1).sum()
    assert n_dense_in >= n_raw_in

    # voxelization emits all 4 streams + reformat flattens them
    vox = Voxelization(cfg=dict(
        range=[-8.0, -8.0, -2.0, 8.0, 8.0, 4.0], voxel_size=[0.5, 0.5, 0.25],
        max_points_in_voxel=5, max_voxel_num=[2048, 2048], distillation=True,
    ))
    res, _ = vox(res, info)
    res["lidar"]["targets"] = {}
    bundle, _ = Reformat(distillation=True)(res, info)
    for key in ("dense_voxels", "reconstruction_voxels",
                "reconstruction_voxels_2", "reconstruction_voxels_4"):
        assert key in bundle and len(bundle[key]) > 0
