"""Data layer end-to-end: synthetic on-disk Waymo frames -> pipeline ->
collate -> static batch consumable by the models."""
import os
import pickle

import numpy as np
import pytest

from sparse2dense_tpu.data.loader import InputPipeline, ShardedSampler, build_dataset, collate
from sparse2dense_tpu.core.augment import (
    box_collision_test,
    global_rotation,
    global_scaling,
    random_flip_both,
)
from sparse2dense_tpu.core import box_np_ops

CLASSES = ["VEHICLE", "PEDESTRIAN", "CYCLIST"]


def _write_synthetic_waymo(tmp, n_frames=4, n_points=800, n_obj=3, seed=0):
    """Per-frame pickles + infos pkl in the reference's layout."""
    rng = np.random.RandomState(seed)
    os.makedirs(os.path.join(tmp, "lidar"), exist_ok=True)
    infos = []
    for i in range(n_frames):
        pts = rng.uniform(-7, 7, size=(n_points, 3)).astype(np.float32)
        feats = rng.uniform(0, 1, size=(n_points, 2)).astype(np.float32)
        frame = {
            "lidars": {
                "points_xyz": pts,
                "points_feature": feats,
            }
        }
        path = os.path.join(tmp, "lidar", f"frame_{i}.pkl")
        with open(path, "wb") as f:
            pickle.dump(frame, f)
        boxes = np.concatenate(
            [
                rng.uniform(-5, 5, (n_obj, 2)),
                rng.uniform(-0.5, 1.5, (n_obj, 1)),
                rng.uniform(1.0, 3.0, (n_obj, 3)),
                np.zeros((n_obj, 2)),
                rng.uniform(-np.pi, np.pi, (n_obj, 1)),
            ],
            axis=1,
        ).astype(np.float32)
        names = np.array([CLASSES[j % 3] for j in range(n_obj)])
        infos.append({
            "token": f"frame_{i}",
            "path": path,
            "gt_boxes": boxes,
            "gt_names": names,
            "gt_signs": [f"obj_{i}_{j}" for j in range(n_obj)],
            "sweeps": [],
        })
    info_path = os.path.join(tmp, "infos_train.pkl")
    with open(info_path, "wb") as f:
        pickle.dump(infos, f)
    return info_path


def _data_cfg(info_path, tmp, distillation):
    voxel_generator = dict(
        range=[-8.0, -8.0, -2.0, 8.0, 8.0, 4.0],
        voxel_size=[0.5, 0.5, 0.25],
        max_points_in_voxel=5,
        max_voxel_num=[512, 512],
        distillation=distillation,
    )
    train_preprocessor = dict(
        mode="train",
        shuffle_points=True,
        global_rot_noise=[-0.785, 0.785],
        global_scale_noise=[0.95, 1.05],
        db_sampler=None,
        class_names=CLASSES,
        distillation=distillation,
        gt_dir=os.path.join(tmp, "gt"),
    )
    assigner = dict(
        target_assigner=dict(tasks=[dict(num_class=3, class_names=CLASSES)]),
        out_size_factor=8,
        dense_reg=1,
        gaussian_overlap=0.1,
        max_objs=20,
        min_radius=2,
    )
    pipeline = [
        dict(type="LoadPointCloudFromFile", dataset="WaymoDataset"),
        dict(type="LoadPointCloudAnnotations", with_bbox=True),
        dict(type="Preprocess", cfg=train_preprocessor),
        dict(type="Voxelization", cfg=voxel_generator),
        dict(type="AssignLabel", cfg=assigner),
        dict(type="Reformat", distillation=distillation),
    ]
    return dict(
        type="WaymoDataset",
        root_path=tmp,
        info_path=info_path,
        nsweeps=1,
        class_names=CLASSES,
        pipeline=pipeline,
    )


@pytest.mark.parametrize("distillation", [False, True])
def test_pipeline_and_collate(tmp_path, distillation):
    tmp = str(tmp_path)
    info_path = _write_synthetic_waymo(tmp)
    ds = build_dataset(_data_cfg(info_path, tmp, distillation))
    assert len(ds) == 4

    ex = ds[0]
    assert ex["voxels"].shape[1:] == (5, 5)
    assert ex["coordinates"].shape[1] == 3
    assert len(ex["hm"]) == 1 and ex["hm"][0].shape == (4, 4, 3)
    if distillation:
        for tag in ("", "_2", "_4"):
            assert f"reconstruction_voxels{tag}" in ex
        assert "dense_voxels" in ex

    batch = collate([ds[0], ds[1]], max_voxels=256)
    assert batch["voxels"].shape == (2, 256, 5, 5)
    assert batch["coordinates"].shape == (2, 256, 3)
    assert batch["coordinates"].dtype == np.int32
    # padded rows are -1
    nv = int(ds[0]["num_voxels"][0])
    assert (batch["coordinates"][0, nv:] == -1).all()
    assert batch["hm"][0].shape == (2, 4, 4, 3)
    assert batch["gt_boxes_and_cls"].shape == (2, 20, 10)


def test_input_pipeline_iterates(tmp_path):
    tmp = str(tmp_path)
    info_path = _write_synthetic_waymo(tmp)
    ds = build_dataset(_data_cfg(info_path, tmp, False))
    pipe = InputPipeline(ds, batch_size=2, max_voxels=128, prefetch=0,
                         to_device=False)
    batches = list(pipe)
    assert len(batches) == 2
    assert batches[0]["voxels"].shape[0] == 2


def test_input_pipeline_multiprocess_workers(tmp_path):
    """num_workers>0 must produce byte-identical batches, in order, via
    spawn worker processes (the reference's workers_per_gpu path)."""
    tmp = str(tmp_path)
    info_path = _write_synthetic_waymo(tmp)
    cfg = _data_cfg(info_path, tmp, False)
    # deterministic (val-mode) pipeline so worker-local RNG state is moot
    cfg["pipeline"][2]["cfg"].update(mode="val", shuffle_points=False)
    ds = build_dataset(cfg)
    kw = dict(batch_size=2, max_voxels=128, to_device=False, shuffle=False)
    ref_batches = list(InputPipeline(ds, prefetch=0, **kw))
    mp_batches = list(InputPipeline(ds, num_workers=2, **kw))
    assert len(mp_batches) == len(ref_batches) == 2
    for a, b in zip(mp_batches, ref_batches):
        assert sorted(a.keys()) == sorted(b.keys())
        np.testing.assert_array_equal(a["voxels"], b["voxels"])
        np.testing.assert_array_equal(a["coordinates"], b["coordinates"])


def test_sharded_sampler_partitions():
    s0 = ShardedSampler(10, shuffle=True, seed=1, num_shards=2, shard_id=0)
    s1 = ShardedSampler(10, shuffle=True, seed=1, num_shards=2, shard_id=1)
    i0, i1 = s0.epoch_indices(3), s1.epoch_indices(3)
    assert len(i0) == len(i1) == 5
    assert set(i0) | set(i1) == set(range(10))
    # different epoch -> different permutation
    assert not np.array_equal(s0.epoch_indices(3), s0.epoch_indices(4))


def test_augment_coherence_across_streams(rng):
    """All point streams must receive the identical transform."""
    boxes = np.array([[1.0, 2.0, 0.0, 2.0, 4.0, 1.5, 0.3]], np.float32)
    a = rng.randn(50, 5).astype(np.float32)
    b = a.copy()
    gt, streams = global_rotation(boxes.copy(), [a, b], rotation=[0.5, 0.5])
    np.testing.assert_allclose(streams[0], streams[1])
    # rotation by exactly 0.5 rad
    expect = np.array([1.0 * np.cos(0.5) - 2.0 * np.sin(0.5),
                       1.0 * np.sin(0.5) + 2.0 * np.cos(0.5)])
    np.testing.assert_allclose(gt[0, :2], expect, rtol=1e-5)

    gt2, streams2 = global_scaling(boxes.copy(), [a.copy(), a.copy()], 1.1, 1.1)
    np.testing.assert_allclose(streams2[0], streams2[1])
    np.testing.assert_allclose(gt2[0, 3:6], boxes[0, 3:6] * 1.1, rtol=1e-6)


def test_box_collision():
    boxes = np.array([[0, 0, 2, 2, 0.0], [0.5, 0.5, 2, 2, 0.3],
                      [10, 10, 1, 1, 0.0]], np.float32)
    coll = box_collision_test(boxes, boxes)
    assert coll[0, 1] and coll[1, 0]
    assert not coll[0, 2] and not coll[2, 0]


def test_points_in_rbbox_rotated():
    box = np.array([[0, 0, 0, 2.0, 4.0, 2.0, np.pi / 2]], np.float32)
    # after 90deg rotation, the long axis (l=4) lies along x
    pts = np.array([[1.5, 0, 0], [0, 1.5, 0], [2.5, 0, 0]], np.float32)
    inside = box_np_ops.points_in_rbbox(pts, box)[:, 0]
    assert inside.tolist() == [True, False, False]
