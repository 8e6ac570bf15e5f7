"""Second-stage RoI head, TPU-native.

Rebuild of the reference RoIHead + RoIHeadTemplate + ProposalTargetLayer
(det3d/models/roi_heads/roi_head.py:17, roi_head_template.py:18,
target_assigner/proposal_target_layer.py:14, all OpenPCDet-derived) with
static shapes:

- ``proposal_target_layer``: per-sample IoU3D of ROIs vs same-class GTs, then
  fg/hard-bg/easy-bg subsampling to a fixed ROI_PER_IMAGE via priority-keyed
  top-k (deviation: the reference samples background *with* replacement via
  randint; here sampling is without replacement, same expected composition);
- canonical-frame regression targets with heading flip
  (roi_head_template.py:43-87);
- shared FC -> cls (iou score) / reg branches; losses = BCE-with-logits on
  soft iou labels + fg-masked L1 (roi_head_template.py:88-151);
- ``generate_predicted_boxes``: local deltas rotated back to world
  (roi_head_template.py:160-182).
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..norm import BatchNorm
from ..registry import ROI_HEAD
from ...ops.iou3d import boxes_iou3d
from ...ops.topk import top_k


def limit_period(val, offset=0.5, period=np.pi):
    return val - jnp.floor(val / period + offset) * period


def rotate_xy(x, y, angle):
    c, s = jnp.cos(angle), jnp.sin(angle)
    return x * c - y * s, x * s + y * c


def max_iou_with_same_class(rois, roi_labels, gt_boxes, gt_labels):
    """(R, 7) rois vs (G, 7) gts, IoU masked to matching class labels.
    Returns (max_overlap (R,), gt_assignment (R,))."""
    iou = boxes_iou3d(rois, gt_boxes)  # (R, G)
    same = roi_labels[:, None] == gt_labels[None, :]
    gt_valid = jnp.any(gt_boxes[:, 3:6] > 0, axis=-1)  # zero-padded gts
    iou = jnp.where(same & gt_valid[None, :], iou, -1.0)
    gt_assignment = jnp.argmax(iou, axis=1)
    max_overlap = jnp.maximum(jnp.max(iou, axis=1), 0.0)
    return max_overlap, gt_assignment


def subsample_rois(max_overlaps, roi_valid, cfg, rng):
    """Priority-keyed static subsampling to ROI_PER_IMAGE indices
    (reference proposal_target_layer.py:139-214)."""
    m = min(int(cfg["ROI_PER_IMAGE"]), max_overlaps.shape[0])
    fg_per = int(round(cfg["FG_RATIO"] * m))
    fg_thresh = min(cfg["REG_FG_THRESH"], cfg["CLS_FG_THRESH"])

    r = max_overlaps.shape[0]
    rand = jax.random.uniform(rng, (r,))
    is_fg = (max_overlaps >= fg_thresh) & roi_valid
    is_easy = (max_overlaps < cfg["CLS_BG_THRESH_LO"]) & roi_valid
    is_hard = (
        (max_overlaps < cfg["REG_FG_THRESH"])
        & (max_overlaps >= cfg["CLS_BG_THRESH_LO"])
        & roi_valid
    )

    def rank_within(mask):
        key = jnp.where(mask, rand, -1.0)
        order = jnp.argsort(-key)
        ranks = jnp.zeros(r, jnp.int32).at[order].set(jnp.arange(r, dtype=jnp.int32))
        return ranks

    n_fg = jnp.sum(is_fg)
    fg_take = jnp.minimum(fg_per, n_fg)
    bg_slots = m - fg_take
    n_hard = jnp.sum(is_hard)
    n_easy = jnp.sum(is_easy)
    hard_take = jnp.minimum(
        jnp.floor(bg_slots * cfg["HARD_BG_RATIO"]).astype(jnp.int32), n_hard
    )
    easy_take = jnp.minimum(bg_slots - hard_take, n_easy)
    # if easy bg is short, backfill with more hard bg
    hard_take = jnp.minimum(hard_take + (bg_slots - hard_take - easy_take), n_hard)

    key = jnp.where(is_fg & (rank_within(is_fg) < fg_take), 3.0 + rand, rand - 1.0)
    key = jnp.where(is_hard & (rank_within(is_hard) < hard_take), 2.0 + rand, key)
    key = jnp.where(is_easy & (rank_within(is_easy) < easy_take), 1.0 + rand, key)
    _, idx = top_k(key, m)
    return idx


def canonical_targets(rois, gt_of_rois):
    """Transform matched gts into each ROI's canonical frame with heading
    flip (reference roi_head_template.py:43-87). rois/gt (B, M, 7[+...])."""
    roi_ry = limit_period(rois[..., 6], 0.5, np.pi * 2)
    d = gt_of_rois[..., :6] - rois[..., :6]
    lx, ly = rotate_xy(d[..., 0], d[..., 1], -roi_ry)
    heading = gt_of_rois[..., 6] - roi_ry
    heading = heading % (2 * np.pi)
    opposite = (heading > np.pi * 0.5) & (heading < np.pi * 1.5)
    heading = jnp.where(opposite, (heading + np.pi) % (2 * np.pi), heading)
    heading = jnp.where(heading > np.pi, heading - 2 * np.pi, heading)
    heading = jnp.clip(heading, -np.pi / 2, np.pi / 2)
    return jnp.concatenate(
        [lx[..., None], ly[..., None], d[..., 2:3], gt_of_rois[..., 3:6],
         heading[..., None]],
        axis=-1,
    )


def proposal_target_layer(batch, cfg, rng):
    """batch: rois (B,R,7), roi_labels (B,R) 1-based, roi_scores, roi_valid,
    roi_features (B,R,C), gt_boxes_and_cls (B,G,8). Returns fixed (B,M,...)
    targets dict."""
    b = batch["rois"].shape[0]
    keys = jax.random.split(rng, b)

    def one(rois, labels, scores, valid, feats, gt, key):
        gt_boxes = gt[:, :7]
        gt_labels = gt[:, -1].astype(jnp.int32)
        max_ov, gt_assign = max_iou_with_same_class(rois, labels, gt_boxes, gt_labels)
        idx = subsample_rois(max_ov, valid, cfg, key)
        return (
            rois[idx], labels[idx], scores[idx], max_ov[idx],
            feats[idx], gt_boxes[gt_assign[idx]],
        )

    rois, labels, scores, ious, feats, gts = jax.vmap(one)(
        batch["rois"], batch["roi_labels"], batch["roi_scores"],
        batch["roi_valid"], batch["roi_features"], batch["gt_boxes_and_cls"],
        keys,
    )
    reg_valid = (ious > cfg["REG_FG_THRESH"]).astype(jnp.float32)
    fg = ious > cfg["CLS_FG_THRESH"]
    bg = ious < cfg["CLS_BG_THRESH"]
    interval = (~fg) & (~bg)
    cls_labels = fg.astype(jnp.float32)
    soft = (ious - cfg["CLS_BG_THRESH"]) / (
        cfg["CLS_FG_THRESH"] - cfg["CLS_BG_THRESH"]
    )
    cls_labels = jnp.where(interval, soft, cls_labels)
    gt_ct = canonical_targets(rois, gts)
    return {
        "rois": rois,
        "roi_labels": labels,
        "roi_scores": scores,
        "roi_features": feats,
        "reg_valid_mask": reg_valid,
        "rcnn_cls_labels": cls_labels,
        "gt_of_rois": gt_ct,
    }


class FCStack(nn.Module):
    features: Any
    out_channels: Optional[int] = None
    dp_ratio: float = 0.0
    dp_first_only: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool):
        for k, f in enumerate(self.features):
            x = nn.Dense(f, use_bias=False, name=f"fc_{k}")(x)
            x = BatchNorm(axis_name=self.axis_name, name=f"bn_{k}")(
                x, use_running_average=not train
            )
            x = nn.relu(x)
            use_dp = self.dp_ratio > 0 and (k == 0 if self.dp_first_only
                                            else k != len(self.features) - 1)
            if use_dp:
                x = nn.Dropout(self.dp_ratio, deterministic=not train)(x)
        if self.out_channels is not None:
            x = nn.Dense(self.out_channels, name="out",
                         kernel_init=nn.initializers.normal(0.001))(x)
        return x


@ROI_HEAD.register_module
class RoIHead(nn.Module):
    input_channels: int = 2560
    model_cfg: Any = None
    num_class: int = 1
    code_size: int = 7
    test_cfg: Optional[Any] = None
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, roi_features, train: bool = False):
        """roi_features (B, M, C) -> (rcnn_cls (B, M, 1), rcnn_reg (B, M, code))."""
        cfg = dict(self.model_cfg)
        b, m, c = roi_features.shape
        x = roi_features.reshape(b * m, c)
        x = FCStack(tuple(cfg["SHARED_FC"]), dp_ratio=cfg.get("DP_RATIO", 0),
                    axis_name=self.axis_name, name="shared_fc")(x, train)
        cls = FCStack(tuple(cfg["CLS_FC"]), out_channels=self.num_class,
                      dp_ratio=cfg.get("DP_RATIO", 0), dp_first_only=True,
                      axis_name=self.axis_name, name="cls_layers")(x, train)
        reg = FCStack(tuple(cfg["REG_FC"]), out_channels=self.code_size,
                      dp_ratio=cfg.get("DP_RATIO", 0), dp_first_only=True,
                      axis_name=self.axis_name, name="reg_layers")(x, train)
        return cls.reshape(b, m, -1), reg.reshape(b, m, -1)


def roi_head_loss(rcnn_cls, rcnn_reg, targets, loss_cfg):
    """BCE iou-score + fg-masked L1 (reference roi_head_template.py:88-151)."""
    w = dict(loss_cfg["LOSS_WEIGHTS"])
    labels = targets["rcnn_cls_labels"].reshape(-1)
    logits = rcnn_cls.reshape(-1)
    valid = (labels >= 0).astype(jnp.float32)
    bce = (
        jnp.maximum(logits, 0) - logits * labels
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )
    cls_loss = jnp.sum(bce * valid) / jnp.maximum(jnp.sum(valid), 1.0)
    cls_loss = cls_loss * w["rcnn_cls_weight"]

    code = rcnn_reg.shape[-1]
    fg = targets["reg_valid_mask"].reshape(-1)
    reg = rcnn_reg.reshape(-1, code)
    gt = targets["gt_of_rois"][..., :code].reshape(-1, code)
    l1 = jnp.abs(reg - gt) * jnp.asarray(w["code_weights"])
    reg_loss = jnp.sum(l1 * fg[:, None]) / jnp.maximum(jnp.sum(fg), 1.0)
    reg_loss = reg_loss * w["rcnn_reg_weight"]
    return cls_loss + reg_loss, {"rcnn_loss_cls": cls_loss,
                                 "rcnn_loss_reg": reg_loss}


def generate_predicted_boxes(rois, rcnn_reg):
    """Local deltas -> world boxes (reference roi_head_template.py:160-182)."""
    roi_ry = rois[..., 6]
    local = rcnn_reg + jnp.concatenate(
        [jnp.zeros_like(rois[..., :3]), rois[..., 3:]], axis=-1
    )
    x, y = rotate_xy(local[..., 0], local[..., 1], roi_ry)
    xyz = jnp.stack([x, y, local[..., 2]], axis=-1) + rois[..., :3]
    return jnp.concatenate([xyz, local[..., 3:]], axis=-1)
