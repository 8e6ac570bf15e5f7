"""PointPillars single-stage detector (reference det3d/models/detectors/
point_pillars.py:11 + single_stage.py:11).

A thin flax composition: reader -> scatter backbone -> RPN neck -> CenterHead.
The batch dict carries static-shape arrays (see readers/pillar_encoder.py for
the layout). ``loss``/``predict`` are pure functions of the raw head outputs
so the same applied forward serves training and inference.
"""
from __future__ import annotations

from typing import Any, Optional

from flax import linen as nn

from ..registry import DETECTORS
from ..heads.center_head import center_head_loss, center_head_predict


@DETECTORS.register_module
class PointPillars(nn.Module):
    reader: nn.Module
    backbone: nn.Module
    neck: nn.Module
    bbox_head: nn.Module
    train_cfg: Optional[Any] = None
    test_cfg: Optional[Any] = None
    pretrained: Optional[str] = None

    def extract_feat(self, example, train: bool):
        feats = self.reader(
            example["voxels"], example["num_points"], example["coordinates"], train
        )
        canvas = self.backbone(feats, example["coordinates"], train)
        return self.neck(canvas, train)

    @nn.compact
    def __call__(self, example, train: bool = False):
        x = self.extract_feat(example, train)
        return self.bbox_head(x, train)

    # pure post-hoc functions (no params) ------------------------------------
    def loss(self, preds, example):
        return center_head_loss(
            preds,
            example,
            weight=self.bbox_head.weight,
            code_weights=self.bbox_head.code_weights,
            dataset=self.bbox_head.dataset,
        )

    def predict(self, preds, test_cfg=None):
        cfg = test_cfg if test_cfg is not None else self.test_cfg
        return center_head_predict(preds, cfg, self.bbox_head.num_classes)
