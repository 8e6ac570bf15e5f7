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
        return self.neck(canvas, train), canvas

    @nn.compact
    def __call__(
        self,
        example,
        train: bool = False,
        return_feature: bool = False,
        return_recon_feature: bool = False,
    ):
        """With ``return_feature``, also returns F_D_a (the pre-neck BEV
        canvas) and — when ``return_recon_feature`` — F_D_b, the canvas of the
        ``reconstruction_*`` stream (teacher role; reference
        point_pillars.py:38-89 computes F_D_b whenever return_loss=False)."""
        if "dense_voxels" in example:
            sub = {
                "voxels": example["dense_voxels"],
                "num_points": example["dense_num_points"],
                "coordinates": example["dense_coordinates"],
            }
        else:
            sub = example
        x, canvas = self.extract_feat(sub, train)
        preds = self.bbox_head(x, train)
        if not return_feature:
            return preds
        f_b = None
        if return_recon_feature:
            rfeats = self.reader(
                example["reconstruction_voxels"],
                example["reconstruction_num_points"],
                example["reconstruction_coordinates"],
                train,
            )
            f_b = self.backbone(rfeats, example["reconstruction_coordinates"], train)
        return preds, canvas, f_b

    def forward_two_stage(self, example, train: bool = False):
        """(reference point_pillars.py:91-126)."""
        import jax

        x, _ = self.extract_feat(example, train)
        preds = self.bbox_head(x, train)
        boxes = self.predict(jax.lax.stop_gradient(preds), self.test_cfg)
        return boxes, x, preds

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
