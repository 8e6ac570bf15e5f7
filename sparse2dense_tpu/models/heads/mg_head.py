"""MultiGroupHead: the SECOND anchor-based head, TPU-native.

Rebuild of the reference (det3d/models/bbox_heads/mg_head.py:199-1000) in
NHWC with static shapes:

- per-task 1x1 convs for (box, cls, dir) predictions;
- ``mg_head_loss``: sigmoid focal cls + codewise smooth-L1 reg with sin-diff
  rotation encoding + softmax direction classifier, normalized by num
  positives (NormByNumPositives, mg_head.py:571-600);
- ``mg_head_predict``: box-coder decode against the (static) anchors,
  direction flip, score threshold + rotated NMS with fixed pre/post sizes —
  fixed-size outputs with a validity mask.

Targets come from the AssignTarget pipeline stage: per task
labels (B, A) int32 (-1 ignore / 0 bg / class id), reg_targets (B, A, code),
anchors (B, A, nd).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..registry import HEADS
from ..losses.second_losses import (
    sigmoid_focal_loss,
    weighted_smooth_l1,
    weighted_softmax_ce,
)
from ...core.box_np_ops import second_box_decode
from ...ops.nms import rotated_nms
from ...ops.topk import top_k


def add_sin_difference(boxes1, boxes2):
    """sin(a-b) rotation encoding (reference mg_head.py:29-35)."""
    rad_pred = jnp.sin(boxes1[..., -1:]) * jnp.cos(boxes2[..., -1:])
    rad_tg = jnp.cos(boxes1[..., -1:]) * jnp.sin(boxes2[..., -1:])
    b1 = jnp.concatenate([boxes1[..., :-1], rad_pred], axis=-1)
    b2 = jnp.concatenate([boxes2[..., :-1], rad_tg], axis=-1)
    return b1, b2


def limit_period(val, offset=0.5, period=np.pi):
    return val - jnp.floor(val / period + offset) * period


def get_direction_target(anchors, reg_targets, dir_offset=0.0):
    """One-hot (B, A, 2) direction targets (reference mg_head.py:54-64)."""
    rot_gt = reg_targets[..., -1] + anchors[..., -1]
    cls = (limit_period(rot_gt - dir_offset, 0.5, 2 * np.pi) > 0).astype(jnp.int32)
    return jax.nn.one_hot(cls, 2)


@HEADS.register_module
class MultiGroupHead(nn.Module):
    mode: str = "3d"
    in_channels: int = 128
    tasks: Sequence[Any] = ()
    weights: Sequence[float] = (1,)
    box_coder: Any = None  # GroundBox3dCoder
    encode_background_as_zeros: bool = True
    loss_norm: Any = None
    loss_cls: Any = None
    use_sigmoid_score: bool = True
    loss_bbox: Any = None
    encode_rad_error_by_sin: bool = True
    loss_aux: Any = None
    direction_offset: float = 0.0
    norm_cfg: Optional[dict] = None
    logger: Optional[object] = None
    axis_name: Optional[str] = None

    @property
    def num_classes(self):
        return [len(t["class_names"]) for t in self.tasks]

    @property
    def num_anchor_per_locs(self):
        # 2 rotations per class (reference mg_head.py:452)
        return [2 * n for n in self.num_classes]

    @property
    def use_direction_classifier(self):
        return self.loss_aux is not None

    @nn.compact
    def __call__(self, x, train: bool = False):
        code_size = self.box_coder.code_size
        preds = []
        for t, (num_c, num_a) in enumerate(
            zip(self.num_classes, self.num_anchor_per_locs)
        ):
            num_cls = num_a * (num_c if self.encode_background_as_zeros
                               else num_c + 1)
            box = nn.Conv(num_a * code_size, (1, 1), name=f"task_{t}_conv_box")(x)
            cls = nn.Conv(num_cls, (1, 1), name=f"task_{t}_conv_cls")(x)
            pd = {"box_preds": box, "cls_preds": cls}
            if self.use_direction_classifier:
                pd["dir_cls_preds"] = nn.Conv(
                    num_a * 2, (1, 1), name=f"task_{t}_conv_dir"
                )(x)
            preds.append(pd)
        return preds


def prepare_loss_weights(labels, pos_cls_weight=1.0, neg_cls_weight=1.0):
    """NormByNumPositives (reference mg_head.py:566-600)."""
    cared = labels >= 0
    positives = labels > 0
    negatives = labels == 0
    cls_weights = (
        negatives.astype(jnp.float32) * neg_cls_weight
        + positives.astype(jnp.float32) * pos_cls_weight
    )
    reg_weights = positives.astype(jnp.float32)
    pos_normalizer = jnp.maximum(
        jnp.sum(positives, axis=1, keepdims=True).astype(jnp.float32), 1.0
    )
    return cls_weights / pos_normalizer, reg_weights / pos_normalizer, cared


def mg_head_loss(head: MultiGroupHead, preds, example):
    """Total loss + logs over tasks (reference mg_head.py:580-695)."""
    loss_cls_cfg = dict(head.loss_cls or {})
    loss_bbox_cfg = dict(head.loss_bbox or {})
    loss_norm_cfg = dict(head.loss_norm or {})
    code_size = head.box_coder.code_size
    total = 0.0
    logs = {}
    for task_id, pd in enumerate(preds):
        num_class = head.num_classes[task_id]
        labels = example["labels"][task_id]  # (B, A)
        reg_targets = example["reg_targets"][task_id]  # (B, A, code)
        anchors = example["anchors"][task_id]  # (B, A, nd)
        b = labels.shape[0]

        box_preds = pd["box_preds"].reshape(b, -1, code_size)
        cls_preds = pd["cls_preds"].reshape(b, -1, num_class)

        cls_weights, reg_weights, cared = prepare_loss_weights(
            labels,
            pos_cls_weight=loss_norm_cfg.get("pos_cls_weight", 1.0),
            neg_cls_weight=loss_norm_cfg.get("neg_cls_weight", 1.0),
        )
        cls_targets = labels * cared.astype(labels.dtype)
        one_hot = jax.nn.one_hot(cls_targets, num_class + 1)[..., 1:]

        bp, rt = box_preds, reg_targets
        if head.encode_rad_error_by_sin:
            bp, rt = add_sin_difference(bp, rt)
        loc_loss = weighted_smooth_l1(
            bp, rt, reg_weights,
            sigma=loss_bbox_cfg.get("sigma", 3.0),
            code_weights=loss_bbox_cfg.get("code_weights"),
        )
        cls_loss = sigmoid_focal_loss(
            cls_preds, one_hot, cls_weights,
            alpha=loss_cls_cfg.get("alpha", 0.25),
            gamma=loss_cls_cfg.get("gamma", 2.0),
        )
        loc_reduced = jnp.sum(loc_loss) / b * loss_bbox_cfg.get("loss_weight", 1.0)
        cls_reduced = jnp.sum(cls_loss) / b * loss_cls_cfg.get("loss_weight", 1.0)
        task_loss = loc_reduced + cls_reduced

        if head.use_direction_classifier:
            dir_targets = get_direction_target(
                anchors, reg_targets, dir_offset=head.direction_offset
            )
            dir_logits = pd["dir_cls_preds"].reshape(b, -1, 2)
            w = (labels > 0).astype(jnp.float32)
            w = w / jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1.0)
            dir_loss = jnp.sum(weighted_softmax_ce(dir_logits, dir_targets, w)) / b
            task_loss = task_loss + dir_loss * dict(head.loss_aux).get(
                "loss_weight", 0.2
            )
            logs[f"dir_loss_{task_id}"] = dir_loss

        total = total + task_loss
        logs[f"cls_loss_{task_id}"] = cls_reduced
        logs[f"loc_loss_{task_id}"] = loc_reduced
    return total, logs


def mg_head_predict(head: MultiGroupHead, preds, example, test_cfg):
    """Decode + rotated NMS, static shapes (reference mg_head.py:697-1000,
    the use_multi_class_nms=False / use_rotate_nms=True path every shipped
    SECOND config takes)."""
    nms_cfg = test_cfg["nms"]
    pre_max = int(nms_cfg["nms_pre_max_size"])
    post_max = int(nms_cfg["nms_post_max_size"])
    iou_thr = float(nms_cfg["nms_iou_threshold"])
    score_thr = test_cfg["score_threshold"]
    pcr = jnp.asarray(test_cfg["post_center_limit_range"])
    code_size = head.box_coder.code_size

    rets = []
    flag = 0
    for task_id, pd in enumerate(preds):
        num_class = head.num_classes[task_id]
        anchors = example["anchors"][task_id]
        b = anchors.shape[0]
        box_preds = pd["box_preds"].reshape(b, -1, code_size)
        cls_preds = pd["cls_preds"].reshape(b, -1, num_class)
        boxes = head.box_coder.decode(box_preds, anchors, xp=jnp)  # (B, A, nd)

        if head.use_direction_classifier:
            dir_labels = jnp.argmax(pd["dir_cls_preds"].reshape(b, -1, 2), axis=-1)
            opp = jnp.logical_xor(
                boxes[..., -1] - head.direction_offset > 0, dir_labels.astype(bool)
            )
            rot = boxes[..., -1] + jnp.where(opp, np.pi, 0.0)
            boxes = jnp.concatenate([boxes[..., :-1], rot[..., None]], axis=-1)

        scores_all = jax.nn.sigmoid(cls_preds)
        scores = jnp.max(scores_all, axis=-1)
        labels = jnp.argmax(scores_all, axis=-1)

        in_range = jnp.all(boxes[..., :3] >= pcr[:3], axis=-1) & jnp.all(
            boxes[..., :3] <= pcr[3:], axis=-1
        )
        valid = (scores >= score_thr) & in_range
        masked = jnp.where(valid, scores, -jnp.inf)

        k = min(pre_max, masked.shape[-1])
        top_scores, top_idx = top_k(masked, k)
        top_boxes = jnp.take_along_axis(boxes, top_idx[..., None], axis=1)
        top_labels = jnp.take_along_axis(labels, top_idx, axis=1)

        bev = top_boxes[..., jnp.array([0, 1, 3, 4, -1])]
        sel = jax.vmap(lambda bx, s: rotated_nms(bx, s, iou_thr, post_max))(
            bev, top_scores
        )
        sel_valid = sel >= 0
        sel_safe = jnp.maximum(sel, 0)
        out = {
            "box3d_lidar": jnp.take_along_axis(top_boxes, sel_safe[..., None], axis=1),
            "scores": jnp.where(
                sel_valid,
                jnp.take_along_axis(top_scores, sel_safe, axis=1),
                0.0,
            ),
            "label_preds": jnp.take_along_axis(top_labels, sel_safe, axis=1) + flag,
            "valid": sel_valid
            & jnp.isfinite(jnp.take_along_axis(top_scores, sel_safe, axis=1)),
        }
        flag += num_class
        rets.append(out)
    return {
        k: jnp.concatenate([r[k] for r in rets], axis=1)
        for k in ("box3d_lidar", "scores", "label_preds", "valid")
    }
