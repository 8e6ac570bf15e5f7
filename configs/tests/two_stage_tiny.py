# Tiny two-stage config: frozen CenterPoint-Pillar first stage + BEV feature
# extractor + RoIHead, reference schema (cf. configs/waymo/voxelnet/two_stage/
# waymo_centerpoint_voxelnet_two_stage_distill_interval_5.py).
import itertools

tasks = [
    dict(num_class=3, class_names=["VEHICLE", "PEDESTRIAN", "CYCLIST"]),
]
class_names = list(itertools.chain(*[t["class_names"] for t in tasks]))

target_assigner = dict(tasks=tasks)

S_model = dict(
    type="TwoStageDetector",
    first_stage_cfg=dict(
        type="PointPillars",
        pretrained=None,
        reader=dict(
            type="PillarFeatureNet",
            num_filters=[32, 32],
            num_input_features=5,
            with_distance=False,
            voxel_size=(0.5, 0.5, 6.0),
            pc_range=(-8.0, -8.0, -2.0, 8.0, 8.0, 4.0),
        ),
        backbone=dict(type="PointPillarsScatter", ds_factor=1, num_input_features=32),
        neck=dict(
            type="RPN",
            layer_nums=[1, 1, 1],
            ds_layer_strides=[1, 2, 2],
            ds_num_filters=[32, 64, 64],
            us_layer_strides=[1, 2, 4],
            us_num_filters=[32, 32, 32],
            num_input_features=32,
        ),
        bbox_head=dict(
            type="CenterHead",
            in_channels=96,
            tasks=tasks,
            dataset="waymo",
            weight=2,
            code_weights=[1.0] * 8,
            common_heads={"reg": (2, 2), "height": (1, 2), "dim": (3, 2), "rot": (2, 2)},
            share_conv_channel=32,
        ),
    ),
    second_stage_modules=[
        dict(
            type="BEVFeatureExtractor",
            pc_start=[-8.0, -8.0],
            voxel_size=[0.5, 0.5],
            out_stride=1,
        )
    ],
    roi_head=dict(
        type="RoIHead",
        input_channels=96 * 5,
        model_cfg=dict(
            CLASS_AGNOSTIC=True,
            SHARED_FC=[64, 64],
            CLS_FC=[64, 64],
            REG_FC=[64, 64],
            DP_RATIO=0.3,
            TARGET_CONFIG=dict(
                ROI_PER_IMAGE=32,
                FG_RATIO=0.5,
                SAMPLE_ROI_BY_EACH_CLASS=True,
                CLS_SCORE_TYPE="roi_iou",
                CLS_FG_THRESH=0.75,
                CLS_BG_THRESH=0.25,
                CLS_BG_THRESH_LO=0.1,
                HARD_BG_RATIO=0.8,
                REG_FG_THRESH=0.55,
            ),
            LOSS_CONFIG=dict(
                CLS_LOSS="BinaryCrossEntropy",
                REG_LOSS="L1",
                LOSS_WEIGHTS={
                    "rcnn_cls_weight": 1.0,
                    "rcnn_reg_weight": 1.0,
                    "code_weights": [1.0] * 7,
                },
            ),
        ),
        code_size=7,
    ),
    NMS_POST_MAXSIZE=16,
    num_point=5,
    freeze=True,
)

assigner = dict(
    target_assigner=target_assigner,
    out_size_factor=1,
    dense_reg=1,
    gaussian_overlap=0.1,
    max_objs=50,
    min_radius=2,
)

train_cfg = dict(assigner=assigner)

test_cfg = dict(
    post_center_limit_range=[-10, -10, -10.0, 10, 10, 10.0],
    nms=dict(nms_pre_max_size=64, nms_post_max_size=16, nms_iou_threshold=0.7),
    score_threshold=0.1,
    pc_range=[-8.0, -8.0],
    out_size_factor=1,
    voxel_size=[0.5, 0.5],
)

voxel_generator = dict(
    range=[-8.0, -8.0, -2.0, 8.0, 8.0, 4.0],
    voxel_size=[0.5, 0.5, 6.0],
    max_points_in_voxel=8,
    max_voxel_num=[1024, 1024],
)

optimizer_config = dict(grad_clip=dict(max_norm=35, norm_type=2))
optimizer = dict(type="adam", amsgrad=0.0, wd=0.01, fixed_wd=True)
lr_config = dict(type="one_cycle", lr_max=0.003, moms=[0.95, 0.85],
                 div_factor=10.0, pct_start=0.4)
total_epochs = 2
