# Tiny CenterPoint-VoxelNet config for smoke tests: reference schema, shrunk
# to a 32x32x24 voxel grid (sparse_shape (25,32,32) -> BEV 4x4) so CPU jit
# stays fast. The z chain 25->13->7->3->1 is the minimal valid depth for the
# SpMiddleResNetFHD stage strides.
import itertools

tasks = [
    dict(num_class=3, class_names=["VEHICLE", "PEDESTRIAN", "CYCLIST"]),
]
class_names = list(itertools.chain(*[t["class_names"] for t in tasks]))

target_assigner = dict(tasks=tasks)

S_model = dict(
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
        num_input_features=128,
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
    voxel_size=[0.5, 0.5, 0.25],
    max_points_in_voxel=5,
    max_voxel_num=[512, 512],
)

optimizer_config = dict(grad_clip=dict(max_norm=35, norm_type=2))
optimizer = dict(type="adam", amsgrad=0.0, wd=0.01, fixed_wd=True)
lr_config = dict(type="one_cycle", lr_max=0.003, moms=[0.95, 0.85],
                 div_factor=10.0, pct_start=0.4)
total_epochs = 2
