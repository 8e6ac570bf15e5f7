# Tiny nuScenes-style CenterPoint-Pillar config: 6 tasks, velocity head,
# circular NMS — the nusc model family shrunk to a 32x32 grid.
import itertools

tasks = [
    dict(num_class=1, class_names=["car"]),
    dict(num_class=2, class_names=["truck", "construction_vehicle"]),
    dict(num_class=2, class_names=["bus", "trailer"]),
    dict(num_class=1, class_names=["barrier"]),
    dict(num_class=2, class_names=["motorcycle", "bicycle"]),
    dict(num_class=2, class_names=["pedestrian", "traffic_cone"]),
]
class_names = list(itertools.chain(*[t["class_names"] for t in tasks]))

target_assigner = dict(tasks=tasks)

S_model = dict(
    type="PointPillars",
    pretrained=None,
    reader=dict(
        type="PillarFeatureNet",
        num_filters=[32, 32],
        num_input_features=5,
        with_distance=False,
        voxel_size=(0.5, 0.5, 8.0),
        pc_range=(-8.0, -8.0, -5.0, 8.0, 8.0, 3.0),
    ),
    backbone=dict(type="PointPillarsScatter", ds_factor=1, num_input_features=32),
    neck=dict(
        type="RPN",
        layer_nums=[1, 1, 1],
        ds_layer_strides=[1, 2, 2],
        ds_num_filters=[32, 64, 64],
        us_layer_strides=[0.5, 1, 2],
        us_num_filters=[32, 32, 32],
        num_input_features=32,
    ),
    bbox_head=dict(
        type="CenterHead",
        in_channels=96,
        tasks=tasks,
        dataset="nuscenes",
        weight=0.25,
        code_weights=[1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 0.2, 0.2, 1.0, 1.0],
        common_heads={"reg": (2, 2), "height": (1, 2), "dim": (3, 2),
                      "rot": (2, 2), "vel": (2, 2)},
        share_conv_channel=32,
    ),
)

assigner = dict(
    target_assigner=target_assigner,
    out_size_factor=2,
    dense_reg=1,
    gaussian_overlap=0.1,
    max_objs=50,
    min_radius=2,
)

train_cfg = dict(assigner=assigner)

test_cfg = dict(
    post_center_limit_range=[-10, -10, -10.0, 10, 10, 10.0],
    max_per_img=32,
    min_radius=[4, 12, 10, 1, 0.85, 0.175],
    nms=dict(nms_pre_max_size=64, nms_post_max_size=16, nms_iou_threshold=0.2),
    circular_nms=True,
    score_threshold=0.1,
    pc_range=[-8.0, -8.0],
    out_size_factor=2,
    voxel_size=[0.5, 0.5],
)

voxel_generator = dict(
    range=[-8.0, -8.0, -5.0, 8.0, 8.0, 3.0],
    voxel_size=[0.5, 0.5, 8.0],
    max_points_in_voxel=8,
    max_voxel_num=[512, 512],
)

optimizer_config = dict(grad_clip=dict(max_norm=35, norm_type=2))
optimizer = dict(type="adam", amsgrad=0.0, wd=0.01, fixed_wd=True)
lr_config = dict(type="one_cycle", lr_max=0.001, moms=[0.95, 0.85],
                 div_factor=10.0, pct_start=0.4)
total_epochs = 2
