"""Teacher–student (Sparse2Dense) distillation train step.

Rebuild of TS_Trainer.batch_processor_inline (reference
det3d/torchie/trainer/trainer.py:726-845) as ONE jitted function per model
family. The teacher runs frozen (eval mode, no gradient); the student runs in
train mode; the three reference distillation branches are reproduced:

- "pp" (PointPillars, trainer.py:746-773): features max-pooled 2x2 to save
  memory, masked MSE terms all x10 (including the cross F_a-at-F_b-mask
  term), KD heatmap focal, (mask+offset) x 0.5;
- "centerpoint" (SpMiddleResNetFHD, trainer.py:780-811): masked MSE
  x10/x20 on F_a and x5/x20 on F_b, KD heatmap focal, KD regression MSE
  weighted by code_weights x head weight, (mask+offset) x 1;
- "second" (SpMiddleFHD, trainer.py:817-835): masked MSE only, x0.5 PCR.

The masks are F_D > 0 elementwise, exactly as the reference's boolean
indexing; F.mse_loss over a boolean-indexed subset == masked sum / count.
"""
from __future__ import annotations

from typing import Literal

import jax
import jax.numpy as jnp
import optax

from ..models.heads.center_head import _clip_sigmoid
from ..models.losses.centernet import fast_focal_loss, gather_feat_nhwc
from .train_state import TrainState


def masked_mse(pred, target, mask):
    """mean((pred-target)^2) over elements where mask is True."""
    m = mask.astype(pred.dtype)
    n = jnp.maximum(jnp.sum(m), 1.0)
    return jnp.sum(jnp.square(pred - target) * m) / n


def distill_reg_loss(s_anno, t_anno, mask, ind):
    """Per-dim MSE between student/teacher box maps gathered at gt centers
    (reference trainer.py:68-76). s_anno/t_anno: (B, H, W, D)."""
    pred = gather_feat_nhwc(s_anno, ind)
    gt = gather_feat_nhwc(t_anno, ind)
    m = mask.astype(pred.dtype)[..., None]
    loss = jnp.square(pred * m - gt * m) / (jnp.sum(m) + 1e-4)
    return jnp.sum(loss, axis=(0, 1))  # (D,)


def _maxpool2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


def make_teacher_forward(teacher):
    """The frozen dense-teacher forward of the TS step as its own function.

    Jitting the teacher separately from the student update halves the HBM
    peak of full-scale distillation (the fused graph co-schedules the
    teacher's multi-GB dense activations with the student's fwd+bwd;
    measured 25.7 GB needed vs 15.75 available at the Waymo grid).
    Reference flow: det3d/torchie/apis/train.py:343-391."""

    def teacher_forward(t_variables, batch):
        t_preds, f_d_a, f_d_b = teacher.apply(
            t_variables, batch, train=False,
            return_feature=True, return_recon_feature=True,
        )
        return (jax.lax.stop_gradient(t_preds),
                jax.lax.stop_gradient(f_d_a),
                jax.lax.stop_gradient(f_d_b))

    return teacher_forward


def make_ts_train_step(
    teacher,
    student,
    branch: Literal["pp", "centerpoint", "second"],
    pcr_weight: float = None,
):
    """Returns ts_step(t_variables, state, batch) -> (state, metrics).

    ``t_variables`` are the (frozen) teacher params+batch_stats; ``state`` is
    the student TrainState.
    """
    if pcr_weight is None:
        pcr_weight = 1.0 if branch == "centerpoint" else 0.5

    teacher_forward = make_teacher_forward(teacher)

    def student_step(t_out, state: TrainState, batch):
        """Student update given precomputed teacher outputs — jit this and
        ``make_teacher_forward`` separately to halve the HBM peak."""
        t_preds, f_d_a, f_d_b = t_out

        def loss_fn(params):
            out, mutated = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                batch, train=True, mutable=["batch_stats", "telemetry"],
            )
            s_preds = out["preds"]
            task_loss, logs = student.loss(s_preds, batch)
            mask_loss, offset_loss = student.pcr_loss(out, batch)
            f_s_a, f_s_b = out["f_s_a"], out["f_s_b"]

            if branch == "pp":
                a_s, a_d = _maxpool2(f_s_a), _maxpool2(f_d_a)
                inds = a_d > 0
                s2d = masked_mse(a_s, a_d, ~inds) * 10
                s2d += masked_mse(a_s, a_d, inds) * 10
                b_s, b_d = _maxpool2(f_s_b), _maxpool2(f_d_b)
                inds = b_d > 0
                s2d += masked_mse(a_s, a_d, inds) * 10
                s2d += masked_mse(b_s, b_d, inds) * 10
                s2d += masked_mse(b_s, b_d, ~inds) * 10
            else:
                inds = f_d_a > 0
                s2d = masked_mse(f_s_a, f_d_a, inds) * 10
                s2d += masked_mse(f_s_a, f_d_a, ~inds) * 20
                inds = f_d_b > 0
                s2d += masked_mse(f_s_b, f_d_b, inds) * 5
                s2d += masked_mse(f_s_b, f_d_b, ~inds) * 20

            distill = s2d
            if branch in ("pp", "centerpoint"):
                kd_hm = fast_focal_loss(
                    _clip_sigmoid(s_preds[0]["hm"]),
                    jax.nn.sigmoid(t_preds[0]["hm"]),
                    batch["ind"][0], batch["mask"][0], batch["cat"][0],
                )
                distill = distill + kd_hm
                logs["kd_hm_loss"] = kd_hm
            if branch == "centerpoint":
                s_anno = jnp.concatenate(
                    [s_preds[0]["reg"], s_preds[0]["height"], s_preds[0]["dim"],
                     s_preds[0]["rot"]], axis=-1,
                )
                t_anno = jnp.concatenate(
                    [t_preds[0]["reg"], t_preds[0]["height"], t_preds[0]["dim"],
                     t_preds[0]["rot"]], axis=-1,
                )
                kd_reg = distill_reg_loss(
                    s_anno, t_anno, batch["mask"][0], batch["ind"][0]
                )
                cw = jnp.asarray(student.bbox_head.code_weights)[: kd_reg.shape[0]]
                kd_reg = jnp.sum(kd_reg * cw) * student.bbox_head.weight
                distill = distill + kd_reg
                logs["kd_reg_loss"] = kd_reg

            total = task_loss + distill + (mask_loss + offset_loss) * pcr_weight
            logs["sparse2dense_loss"] = s2d
            logs["mask_loss"] = mask_loss
            logs["reconstruction_loss"] = offset_loss
            if branch != "second":  # SECOND teachers have no heatmap head
                logs["T_hm_loss"] = fast_focal_loss(
                    jnp.clip(jax.nn.sigmoid(t_preds[0]["hm"]), 1e-4, 1 - 1e-4),
                    batch["hm"][0], batch["ind"][0], batch["mask"][0],
                    batch["cat"][0],
                )
            return total, (logs, mutated["batch_stats"],
                           mutated.get("telemetry", {}))

        (loss, (logs, new_bs, telem)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads).replace(batch_stats=new_bs)
        metrics = dict(logs)
        metrics["loss"] = loss
        metrics["grad_norm"] = optax.global_norm(grads)
        # sparse-engine budget-overflow / halo-miss counters (see
        # train_state.make_train_step)
        for path, leaf in jax.tree_util.tree_leaves_with_path(telem):
            name = "/".join(getattr(k, "key", str(k)) for k in path)
            metrics[f"telemetry/{name}"] = jnp.sum(leaf)
        return state, metrics

    def ts_step(t_variables, state: TrainState, batch):
        # fused variant (single jit): fine at small scale / sharded meshes
        return student_step(teacher_forward(t_variables, batch), state, batch)

    ts_step.teacher_forward = teacher_forward
    ts_step.student_step = student_step

    return ts_step


def branch_of(teacher_cfg: dict) -> str:
    """Map a teacher model config to its distillation branch (the reference
    keys on backbone._get_name(), trainer.py:741/:775/:813)."""
    bk = teacher_cfg["backbone"]["type"]
    if bk.startswith("PointPillarsScatter"):
        return "pp"
    if bk == "SpMiddleResNetFHD":
        return "centerpoint"
    return "second"
