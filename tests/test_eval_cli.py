"""End-to-end evaluation path: tools/test.py CLI over a synthetic on-disk
Waymo dataset -> detections -> dataset.evaluation fallback + local mAP."""
import os
import pickle
import sys

import numpy as np
import pytest

from tests.test_data_pipeline import _write_synthetic_waymo, CLASSES

CFG_TEMPLATE = '''
import itertools

tasks = [dict(num_class=3, class_names=["VEHICLE", "PEDESTRIAN", "CYCLIST"])]
class_names = list(itertools.chain(*[t["class_names"] for t in tasks]))
target_assigner = dict(tasks=tasks)

S_model = dict(
    type="PointPillars",
    pretrained=None,
    reader=dict(
        type="PillarFeatureNet", num_filters=[32, 32], num_input_features=5,
        with_distance=False, voxel_size=(0.5, 0.5, 6.0),
        pc_range=(-8.0, -8.0, -2.0, 8.0, 8.0, 4.0),
    ),
    backbone=dict(type="PointPillarsScatter", ds_factor=1, num_input_features=32),
    neck=dict(type="RPN", layer_nums=[1, 1, 1], ds_layer_strides=[1, 2, 2],
              ds_num_filters=[32, 64, 64], us_layer_strides=[1, 2, 4],
              us_num_filters=[32, 32, 32], num_input_features=32),
    bbox_head=dict(type="CenterHead", in_channels=96, tasks=tasks,
                   dataset="waymo", weight=2, code_weights=[1.0] * 8,
                   common_heads={"reg": (2, 2), "height": (1, 2),
                                 "dim": (3, 2), "rot": (2, 2)},
                   share_conv_channel=32),
)

assigner = dict(target_assigner=target_assigner, out_size_factor=1,
                dense_reg=1, gaussian_overlap=0.1, max_objs=20, min_radius=2)
train_cfg = dict(assigner=assigner)
test_cfg = dict(
    post_center_limit_range=[-10, -10, -10.0, 10, 10, 10.0],
    nms=dict(nms_pre_max_size=64, nms_post_max_size=16, nms_iou_threshold=0.7),
    score_threshold=0.05, pc_range=[-8.0, -8.0], out_size_factor=1,
    voxel_size=[0.5, 0.5],
)
voxel_generator = dict(
    range=[-8.0, -8.0, -2.0, 8.0, 8.0, 4.0], voxel_size=[0.5, 0.5, 6.0],
    max_points_in_voxel=8, max_voxel_num=[512, 512],
)
val_preprocessor = dict(mode="val", shuffle_points=False, distillation=False)
test_pipeline = [
    dict(type="LoadPointCloudFromFile", dataset="WaymoDataset"),
    dict(type="LoadPointCloudAnnotations", with_bbox=True),
    dict(type="Preprocess", cfg=val_preprocessor),
    dict(type="Voxelization", cfg=voxel_generator),
    dict(type="Reformat"),
]
data = dict(
    samples_per_gpu=1,
    workers_per_gpu=1,
    val=dict(type="WaymoDataset", root_path="{ROOT}", info_path="{INFOS}",
             test_mode=True, nsweeps=1, class_names=class_names,
             pipeline=test_pipeline),
    test=dict(type="WaymoDataset", root_path="{ROOT}", info_path="{INFOS}",
              test_mode=True, nsweeps=1, class_names=class_names,
              pipeline=test_pipeline),
)
optimizer_config = dict(grad_clip=dict(max_norm=35, norm_type=2))
optimizer = dict(type="adam", amsgrad=0.0, wd=0.01, fixed_wd=True)
lr_config = dict(type="one_cycle", lr_max=0.003, moms=[0.95, 0.85],
                 div_factor=10.0, pct_start=0.4)
total_epochs = 1
'''


def test_eval_cli_end_to_end(tmp_path, monkeypatch):
    tmp = str(tmp_path)
    info_path = _write_synthetic_waymo(tmp, n_frames=3)
    cfg_path = os.path.join(tmp, "cfg.py")
    with open(cfg_path, "w") as f:
        f.write(CFG_TEMPLATE.replace("{ROOT}", tmp).replace("{INFOS}", info_path))

    from sparse2dense_tpu.tools import test as test_cli

    work = os.path.join(tmp, "eval_out")
    monkeypatch.setattr(sys, "argv", [
        "test", cfg_path, "--work_dir", work, "--batch_size", "1",
        "--max_voxels", "256", "--speed_test",
    ])
    detections = test_cli.main()
    assert len(detections) == 3
    for det in detections.values():
        assert det["box3d_lidar"].ndim == 2
    # devkit absent -> pickle fallback written by dataset.evaluation
    assert os.path.exists(os.path.join(work, "detection_pred.pkl"))

    # local mAP over the same detections (random weights -> mAP ~ 0, but the
    # protocol must run end to end and stay in range)
    from sparse2dense_tpu.core.eval import evaluate_detections

    with open(info_path, "rb") as f:
        infos = pickle.load(f)
    gts = {}
    for info in infos:
        names = list(info["gt_names"])
        gts[info["token"]] = {
            "gt_boxes": info["gt_boxes"],
            "gt_classes": np.array([CLASSES.index(n) + 1 for n in names]),
        }
    res = evaluate_detections(gts, detections, CLASSES)
    assert 0.0 <= res["mAP"] <= 1.0


def test_trainer_val(tmp_path):
    """Trainer.val: jitted inference over the val loader, detections keyed by
    token, dataset.evaluation called (reference trainer.py:500-556)."""
    import jax

    from sparse2dense_tpu.utils import Config
    from sparse2dense_tpu.models import build_detector
    from sparse2dense_tpu.data.loader import InputPipeline, build_dataset
    from sparse2dense_tpu.solver.optim import build_optimizer
    from sparse2dense_tpu.training.train_state import TrainState
    from sparse2dense_tpu.training.trainer import Trainer
    from sparse2dense_tpu.training.synthetic import make_batch

    tmp = str(tmp_path)
    info_path = _write_synthetic_waymo(tmp, n_frames=2)
    cfg_path = os.path.join(tmp, "cfg.py")
    with open(cfg_path, "w") as f:
        f.write(CFG_TEMPLATE.replace("{ROOT}", tmp).replace("{INFOS}", info_path))
    cfg = Config.fromfile(cfg_path)

    model = build_detector(cfg.S_model, train_cfg=cfg.train_cfg,
                           test_cfg=cfg.test_cfg)
    batch = make_batch(cfg, 1, max_voxels=256, n_points=300, n_obj=2)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    tx = build_optimizer(cfg.optimizer, cfg.lr_config, total_steps=4,
                         grad_clip=cfg.optimizer_config["grad_clip"])
    state = TrainState.create(apply_fn=model.apply, params=variables["params"],
                              batch_stats=variables["batch_stats"], tx=tx)
    trainer = Trainer(model, state, tmp, hooks=[])

    ds = build_dataset(cfg.data["val"])
    loader = InputPipeline(ds, batch_size=1, max_voxels=256, shuffle=False,
                           prefetch=0)
    trainer.val(loader, ds, output_dir=os.path.join(tmp, "val_out"))
    assert os.path.exists(os.path.join(tmp, "val_out", "detection_pred.pkl"))
