"""Two-stage detector (reference det3d/models/detectors/two_stage.py:9-199).

First stage = any single-stage detector (incl. KD variants), frozen when
``freeze`` is set. Second stage: BEV feature gather at box centers, fixed-size
ROI tensors (the first stage already emits (B, NMS_POST_MAXSIZE) validity-
masked detections — no ragged padding step needed), ProposalTargetLayer
sampling at train time, RoIHead refinement. Final score =
sqrt(sigmoid(iou) * first_score) (reference :134).

Train-time forward needs a ``proposal`` PRNG stream (ROI subsampling):
``model.apply(vars, batch, train=True, rngs={"proposal": key, "dropout": key2},
mutable=[...])``.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..registry import DETECTORS
from ..second_stage.bev import box_centers
from ..roi_heads.roi_head import (
    generate_predicted_boxes,
    proposal_target_layer,
    roi_head_loss,
)


@DETECTORS.register_module
class TwoStageDetector(nn.Module):
    single_det: nn.Module
    second_stage: Sequence[nn.Module]
    roi_head: nn.Module
    NMS_POST_MAXSIZE: int = 500
    num_point: int = 1
    freeze: bool = False
    train_cfg: Optional[Any] = None
    test_cfg: Optional[Any] = None
    pretrained: Optional[str] = None

    @nn.compact
    def __call__(self, example, train: bool = False):
        first_train = train and not self.freeze
        boxes, bev, preds = self.single_det.forward_two_stage(example, first_train)
        if self.freeze:
            boxes = jax.lax.stop_gradient(boxes)
            bev = jax.lax.stop_gradient(bev)
            preds = jax.lax.stop_gradient(preds)

        box3d = boxes["box3d_lidar"]
        if self.roi_head.code_size == 9:
            # move velocity after rotation (reference two_stage.py:104-107)
            box3d = box3d[..., jnp.array([0, 1, 2, 3, 4, 5, 8, 6, 7])]

        centers = box_centers(boxes["box3d_lidar"], self.num_point)
        feats = [m(bev, centers, self.num_point) for m in self.second_stage]
        roi_features = jnp.concatenate(feats, axis=-1)  # (B, R, C)

        batch = {
            "rois": box3d,
            "roi_labels": boxes["label_preds"].astype(jnp.int32) + 1,
            "roi_scores": boxes["scores"],
            "roi_valid": boxes["valid"],
            "roi_features": roi_features,
        }
        out = {"preds": preds, "first_boxes": boxes}
        if train:
            gt = example["gt_boxes_and_cls"]
            if self.roi_head.code_size == 7:
                gt = gt[..., jnp.array([0, 1, 2, 3, 4, 5, 6, -1])]
            batch["gt_boxes_and_cls"] = gt
            targets = proposal_target_layer(
                batch, dict(dict(self.roi_head.model_cfg)["TARGET_CONFIG"]),
                self.make_rng("proposal"),
            )
            rcnn_cls, rcnn_reg = self.roi_head(targets["roi_features"], train)
            out.update(targets=targets, rcnn_cls=rcnn_cls, rcnn_reg=rcnn_reg)
        else:
            rcnn_cls, rcnn_reg = self.roi_head(roi_features, train)
            out.update(batch=batch, rcnn_cls=rcnn_cls, rcnn_reg=rcnn_reg)
        return out

    # pure post-hoc functions (no params) ------------------------------------
    def loss(self, out, example):
        one_stage_total, logs = self.single_det.loss(out["preds"], example)
        roi_loss, roi_logs = roi_head_loss(
            out["rcnn_cls"], out["rcnn_reg"], out["targets"],
            dict(dict(self.roi_head.model_cfg)["LOSS_CONFIG"]),
        )
        logs.update(roi_logs)
        return one_stage_total + roi_loss, logs

    def predict(self, out, test_cfg=None):
        """Refined fixed-size detections (reference two_stage.py:121-152)."""
        batch = out["batch"]
        rois = batch["rois"]
        boxes = generate_predicted_boxes(rois, out["rcnn_reg"])
        if boxes.shape[-1] == 9:
            boxes = boxes[..., jnp.array([0, 1, 2, 3, 4, 5, 7, 8, 6])]
        scores = jnp.sqrt(
            jax.nn.sigmoid(out["rcnn_cls"][..., 0]) * batch["roi_scores"]
        )
        valid = batch["roi_valid"] & (batch["roi_labels"] != 0)
        return {
            "box3d_lidar": boxes,
            "scores": jnp.where(valid, scores, 0.0),
            "label_preds": batch["roi_labels"] - 1,
            "valid": valid,
        }
