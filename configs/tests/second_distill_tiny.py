# Tiny SECOND distillation config: SpMiddleFHD teacher (MultiGroupHead) +
# KD_VoxelNet student with S2D_RPN — the third TS branch
# (reference waymo_second_3x_distill_interval_5.py shrunk to (41, 32, 32)).
import itertools
import logging

from det3d.builder import build_box_coder
from det3d.utils.config_tool import get_downsample_factor

tasks = [
    dict(num_class=3, class_names=["VEHICLE", "PEDESTRIAN", "CYCLIST"]),
]
class_names = list(itertools.chain(*[t["class_names"] for t in tasks]))

target_assigner = dict(
    type="iou",
    anchor_generators=[
        dict(type="anchor_generator_range", sizes=[2.08, 4.73, 1.77],
             anchor_ranges=[-8.0, -8.0, 0, 8.0, 8.0, 0], rotations=[0, 1.57],
             matched_threshold=0.55, unmatched_threshold=0.4,
             class_name="VEHICLE"),
        dict(type="anchor_generator_range", sizes=[0.84, 0.91, 1.74],
             anchor_ranges=[-8.0, -8.0, 0, 8.0, 8.0, 0], rotations=[0, 1.57],
             matched_threshold=0.5, unmatched_threshold=0.35,
             class_name="PEDESTRIAN"),
        dict(type="anchor_generator_range", sizes=[0.84, 1.81, 1.77],
             anchor_ranges=[-8.0, -8.0, 0, 8.0, 8.0, 0], rotations=[0, 1.57],
             matched_threshold=0.5, unmatched_threshold=0.3,
             class_name="CYCLIST"),
    ],
    sample_positive_fraction=-1,
    sample_size=512,
    region_similarity_calculator=dict(type="nearest_iou_similarity"),
    pos_area_threshold=-1,
    tasks=tasks,
)

box_coder = dict(type="ground_box3d_coder", n_dim=7, linear_dim=False,
                 encode_angle_vector=False)

_head = dict(
    type="MultiGroupHead",
    mode="3d",
    in_channels=64,
    tasks=tasks,
    weights=[1],
    box_coder=build_box_coder(box_coder),
    encode_background_as_zeros=True,
    loss_norm=dict(type="NormByNumPositives", pos_cls_weight=1.0,
                   neg_cls_weight=2.0),
    loss_cls=dict(type="SigmoidFocalLoss", alpha=0.25, gamma=2.0,
                  loss_weight=1.0),
    use_sigmoid_score=True,
    loss_bbox=dict(type="WeightedSmoothL1Loss", sigma=3.0,
                   code_weights=[1.0] * 7, codewise=True, loss_weight=2.0),
    encode_rad_error_by_sin=True,
    loss_aux=dict(type="WeightedSoftmaxClassificationLoss",
                  name="direction_classifier", loss_weight=0.2),
    direction_offset=0.0,
)

model = dict(  # teacher
    type="VoxelNet",
    pretrained=None,
    reader=dict(type="VoxelFeatureExtractorV3", num_input_features=5),
    backbone=dict(type="SpMiddleFHD", num_input_features=5, ds_factor=8),
    neck=dict(type="RPN", layer_nums=[1], ds_layer_strides=[1],
              ds_num_filters=[64], us_layer_strides=[1], us_num_filters=[64],
              num_input_features=128, logger=logging.getLogger("RPN")),
    bbox_head=dict(_head),
)

S_model = dict(  # student
    type="KD_VoxelNet",
    pretrained=None,
    reader=dict(type="VoxelFeatureExtractorV3", num_input_features=5),
    backbone=dict(type="SpMiddleFHD", num_input_features=5, ds_factor=8),
    neck=dict(type="S2D_RPN", layer_nums=[1], ds_layer_strides=[1],
              ds_num_filters=[64], us_layer_strides=[1], us_num_filters=[64],
              num_input_features=128, logger=logging.getLogger("S2D_RPN")),
    bbox_head=dict(_head),
)

assigner = dict(
    box_coder=box_coder,
    target_assigner=target_assigner,
    out_size_factor=get_downsample_factor(S_model),
    debug=False,
)

train_cfg = dict(assigner=assigner)

test_cfg = dict(
    post_center_limit_range=[-10, -10, -10.0, 10, 10, 10.0],
    max_per_img=96,
    nms=dict(use_rotate_nms=True, use_multi_class_nms=False,
             nms_pre_max_size=64, nms_post_max_size=16,
             nms_iou_threshold=0.01),
    score_threshold=0.1,
    pc_range=[-8.0, -8.0],
    out_size_factor=get_downsample_factor(S_model),
)

voxel_generator = dict(
    range=[-8.0, -8.0, -2.0, 8.0, 8.0, 4.0],
    voxel_size=[0.5, 0.5, 0.15],
    max_points_in_voxel=5,
    max_voxel_num=[256, 256],
    distillation=True,
)

optimizer_config = dict(grad_clip=dict(max_norm=35, norm_type=2))
optimizer = dict(type="adam", amsgrad=0.0, wd=0.01, fixed_wd=True)
lr_config = dict(type="one_cycle", lr_max=0.003, moms=[0.95, 0.85],
                 div_factor=10.0, pct_start=0.4)
total_epochs = 2
distillation = True
