# Tiny CenterPoint distillation config: dense teacher (model=VoxelNet) +
# S2D student (S_model=KD_VoxelNet), reference schema. The grid is
# (41, 32, 32) — z keeps the full 41-deep chain (41->21->11->5->2) that the
# PCR generator depths (5 -> 10 -> 20) are architecturally tied to; x/y shrink
# to 32 cells so CPU jit stays fast. BEV is 4x4x256.
import itertools

tasks = [
    dict(num_class=3, class_names=["VEHICLE", "PEDESTRIAN", "CYCLIST"]),
]
class_names = list(itertools.chain(*[t["class_names"] for t in tasks]))

target_assigner = dict(tasks=tasks)

# teacher (dense detector)
model = dict(
    type="VoxelNet",
    pretrained=None,
    reader=dict(type="VoxelFeatureExtractorV3", num_input_features=5),
    backbone=dict(type="SpMiddleResNetFHD", num_input_features=5, ds_factor=8),
    neck=dict(
        type="RPN",
        layer_nums=[1, 1],
        ds_layer_strides=[1, 2],
        ds_num_filters=[64, 64],
        us_layer_strides=[1, 2],
        us_num_filters=[64, 64],
        num_input_features=256,
    ),
    bbox_head=dict(
        type="CenterHead",
        in_channels=128,
        tasks=tasks,
        dataset="waymo",
        weight=2,
        code_weights=[1.0] * 8,
        common_heads={"reg": (2, 2), "height": (1, 2), "dim": (3, 2), "rot": (2, 2)},
        share_conv_channel=32,
    ),
)

# student (sparse detector with S2D + PCR)
S_model = dict(
    type="KD_VoxelNet",
    pretrained=None,
    reader=dict(type="VoxelFeatureExtractorV3", num_input_features=5),
    backbone=dict(type="SpMiddleResNetFHD", num_input_features=5, ds_factor=8),
    neck=dict(
        type="S2D_RPN",
        layer_nums=[1, 1],
        ds_layer_strides=[1, 2],
        ds_num_filters=[64, 64],
        us_layer_strides=[1, 2],
        us_num_filters=[64, 64],
        num_input_features=256,
    ),
    bbox_head=dict(
        type="CenterHead",
        in_channels=128,
        tasks=tasks,
        dataset="waymo",
        weight=2,
        code_weights=[1.0] * 8,
        common_heads={"reg": (2, 2), "height": (1, 2), "dim": (3, 2), "rot": (2, 2)},
        share_conv_channel=32,
    ),
)

assigner = dict(
    target_assigner=target_assigner,
    out_size_factor=8,
    dense_reg=1,
    gaussian_overlap=0.1,
    max_objs=50,
    min_radius=2,
)

train_cfg = dict(assigner=assigner)

test_cfg = dict(
    post_center_limit_range=[-10, -10, -10.0, 10, 10, 10.0],
    nms=dict(nms_pre_max_size=16, nms_post_max_size=8, nms_iou_threshold=0.7),
    score_threshold=0.1,
    pc_range=[-8.0, -8.0],
    out_size_factor=8,
    voxel_size=[0.5, 0.5],
)

voxel_generator = dict(
    range=[-8.0, -8.0, -2.0, 8.0, 8.0, 4.0],
    voxel_size=[0.5, 0.5, 0.15],
    max_points_in_voxel=5,
    max_voxel_num=[512, 512],
)

optimizer_config = dict(grad_clip=dict(max_norm=35, norm_type=2))
optimizer = dict(type="adam", amsgrad=0.0, wd=0.01, fixed_wd=True)
lr_config = dict(type="one_cycle", lr_max=0.003, moms=[0.95, 0.85],
                 div_factor=10.0, pct_start=0.4)
total_epochs = 2
distillation = True
