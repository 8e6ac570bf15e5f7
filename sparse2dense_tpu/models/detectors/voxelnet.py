"""VoxelNet single-stage detector (reference det3d/models/detectors/voxelnet.py:22-141).

Composition: mean-voxel reader -> sparse 3D backbone -> RPN neck -> CenterHead.

Reference semantics preserved:
- when the example carries ``dense_voxels`` (the dense-teacher training mode,
  reference :50-59), the detector silently trains on the densified stream;
- ``return_feature`` exposes F_D_a = the backbone's dense BEV map (pre-neck),
  and ``return_recon_feature`` reruns reader+backbone (shared params) on the
  ``reconstruction_*`` stream to produce F_D_b (reference :73-89) — both are
  consumed by the distillation trainer.

All branching is on dict-key presence / static python flags, so each variant
traces to its own XLA graph.
"""
from __future__ import annotations

from typing import Any, Optional

from flax import linen as nn

from ..registry import DETECTORS
from ..heads.center_head import center_head_loss, center_head_predict
from ..heads.mg_head import MultiGroupHead, mg_head_loss, mg_head_predict


@DETECTORS.register_module
class VoxelNet(nn.Module):
    reader: nn.Module
    backbone: nn.Module
    neck: nn.Module
    bbox_head: nn.Module
    train_cfg: Optional[Any] = None
    test_cfg: Optional[Any] = None
    pretrained: Optional[str] = None

    def extract_feat(self, voxels, num_points, coords, train: bool):
        feats = self.reader(voxels, num_points, coords, train)
        bev, multi_scale = self.backbone(feats, coords, train)
        return self.neck(bev, train), multi_scale, bev

    @nn.compact
    def __call__(
        self,
        example,
        train: bool = False,
        return_feature: bool = False,
        return_recon_feature: bool = False,
    ):
        if "dense_voxels" in example:
            voxels = example["dense_voxels"]
            coords = example["dense_coordinates"]
            num_points = example["dense_num_points"]
        else:
            voxels = example["voxels"]
            coords = example["coordinates"]
            num_points = example["num_points"]

        x, _, f_a = self.extract_feat(voxels, num_points, coords, train)
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
            f_b, _ = self.backbone(
                rfeats, example["reconstruction_coordinates"], train
            )
        return preds, f_a, f_b

    def forward_two_stage(self, example, train: bool = False):
        """First-stage pass for TwoStageDetector (reference voxelnet.py:107-141):
        returns (fixed-size decoded boxes from detached preds, BEV feature map,
        raw preds for the one-stage loss)."""
        import jax

        x, _, _ = self.extract_feat(
            example["voxels"], example["num_points"], example["coordinates"], train
        )
        preds = self.bbox_head(x, train)
        boxes = self.predict(jax.lax.stop_gradient(preds), self.test_cfg,
                             example=example)
        return boxes, x, preds

    # pure post-hoc functions (no params) ------------------------------------
    def loss(self, preds, example):
        if isinstance(self.bbox_head, MultiGroupHead):
            return mg_head_loss(self.bbox_head, preds, example)
        return center_head_loss(
            preds,
            example,
            weight=self.bbox_head.weight,
            code_weights=self.bbox_head.code_weights,
            dataset=self.bbox_head.dataset,
        )

    def predict(self, preds, test_cfg=None, example=None):
        cfg = test_cfg if test_cfg is not None else self.test_cfg
        if isinstance(self.bbox_head, MultiGroupHead):
            return mg_head_predict(self.bbox_head, preds, example, cfg)
        return center_head_predict(preds, cfg, self.bbox_head.num_classes)
