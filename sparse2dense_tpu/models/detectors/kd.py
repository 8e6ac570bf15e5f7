"""Knowledge-distillation student detectors (KD_VoxelNet, KD_PointPillars).

Rebuild of the reference KD detectors (det3d/models/detectors/voxelnet.py:145-301,
point_pillars.py:128-213). The students carry the S2D densification module in
their neck/scatter and a PCR (point cloud reconstruction) head whose targets
are rasterized reconstruction point streams:

- KD_VoxelNet rasterizes the ``reconstruction_*_{2,4}`` voxel streams into
  dense grids at 1/2 and 1/4 resolution (the spconv SparseConvTensor.dense()
  of the mean-point features, reference voxelnet.py:195-215) and supervises
  ``gen_mask``/``gen_offset`` against occupancy and point-mean offsets
  (mask_offset_loss, voxelnet.py:171-185);
- KD_PointPillars does the same at full pillar resolution with a depth-1 grid
  (point_pillars.py:176-213).

The world-coordinate meshgrid the reference hardcodes to Waymo extents
(voxelnet.py:230-244) is derived here from the static ``pc_range_full``
attribute injected by the builder from the voxel_generator config.

Functional surface: __call__ returns a dict {"preds", "f_s_a", "f_s_b",
"gen_*"}; ``loss`` adds head loss + nothing (distill terms live in the TS
train step), ``pcr_loss`` computes (mask_loss, offset_loss).
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..registry import DETECTORS
from ..heads.center_head import center_head_loss, center_head_predict
from ..heads.mg_head import MultiGroupHead, mg_head_loss, mg_head_predict
from ...ops.sparse_conv import scatter_to_dense


def world_grid(shape: Tuple[int, int, int], pc_range_full, dtype=jnp.float32):
    """(D, H, W, 3) xyz cell-center coordinates (reference voxelnet.py:230-244;
    the reference reuses the y cell size for the x half-cell offset — grids are
    square in practice, we use the exact per-axis size)."""
    d, h, w = shape
    x0, y0, z0, x1, y1, z1 = pc_range_full
    zs, ys, xs = jnp.meshgrid(
        jnp.arange(d, dtype=dtype), jnp.arange(h, dtype=dtype),
        jnp.arange(w, dtype=dtype), indexing="ij",
    )
    xs = xs * ((x1 - x0) / w) + x0 + ((x1 - x0) / w) / 2
    ys = ys * ((y1 - y0) / h) + y0 + ((y1 - y0) / h) / 2
    zs = zs * ((z1 - z0) / d) + z0 + ((z1 - z0) / d) / 2
    return jnp.stack([xs, ys, zs], axis=-1)


def mask_offset_loss(gen_offset, gen_mask, gt, grid):
    """Class-balanced BCE on occupancy + L1 on point-mean offsets.

    gen_offset (B,D,H,W,3), gen_mask (B,D,H,W,1), gt (B,D,H,W,C) rasterized
    mean-point features (first 3 channels = xyz), grid (D,H,W,3).
    Reference voxelnet.py:171-185.
    """
    gt_mask = jnp.sum(gt, axis=-1) != 0  # (B,D,H,W)
    z = gt_mask.astype(gen_mask.dtype)
    count_pos = jnp.maximum(jnp.sum(z), 1.0)
    count_neg = jnp.sum(1.0 - z)
    beta = count_neg / count_pos

    x = gen_mask[..., 0]
    bce = beta * z * jax.nn.softplus(-x) + (1.0 - z) * jax.nn.softplus(x)
    loss = jnp.mean(bce)

    g = grid[None] * z[..., None]
    gt_off = gt[..., :3] - g
    ind = (gt_off != 0).astype(gen_offset.dtype)
    n = jnp.maximum(jnp.sum(ind), 1.0)
    com_loss = jnp.sum(jnp.abs(gen_offset - gt_off) * ind) / n
    return loss, com_loss


def rasterize_mean_points(voxels, num_points, coords, grid):
    """Mean-point features scattered to a dense (B,D,H,W,C) grid — the TPU
    analogue of SparseConvTensor(mean_feats, coords, shape).dense()."""
    mean = jnp.sum(voxels, axis=-2) / jnp.maximum(num_points, 1).astype(
        voxels.dtype
    )[..., None]
    valid = jnp.all(coords >= 0, axis=-1)
    mean = mean * valid[..., None].astype(mean.dtype)
    return jax.vmap(lambda f, c, v: scatter_to_dense(f, c, v, grid))(
        mean, coords.astype(jnp.int32), valid
    )


def world_centers(coords, grid_shape, pc_range_full, dtype=jnp.float32):
    """(B, V, 3) xyz world cell centers of zyx integer coords — the
    per-voxel form of ``world_grid`` (same half-cell formulas)."""
    d, h, w = grid_shape
    x0, y0, z0, x1, y1, z1 = pc_range_full
    sx, sy, sz = (x1 - x0) / w, (y1 - y0) / h, (z1 - z0) / d
    cx = coords[..., 2].astype(dtype) * sx + x0 + sx / 2
    cy = coords[..., 1].astype(dtype) * sy + y0 + sy / 2
    cz = coords[..., 0].astype(dtype) * sz + z0 + sz / 2
    return jnp.stack([cx, cy, cz], axis=-1)


def rasterize_pcr_targets_folded(voxels, num_points, coords, grid_shape,
                                 pc_range_full, dtype=jnp.float32):
    """FOLDED PCR targets: (gt_off (B,H,W,D*3), occ (B,H,W,D)).

    Exactly the `rasterize_mean_points` + grid/ind math of the 5D
    ``mask_offset_loss`` (reference voxelnet.py:171-185), but the offset
    target mean_xyz - cell_center*occ is computed PER VOXEL before the
    scatter, so no narrow-minor (…, 3) or (…, C) dense tensor ever
    materializes (those pad 42x on TPU; see PERF.md)."""
    d, h, w = grid_shape
    mean = jnp.sum(voxels, axis=-2) / jnp.maximum(num_points, 1).astype(
        voxels.dtype)[..., None]
    valid = jnp.all(coords >= 0, axis=-1)
    mean = mean * valid[..., None].astype(mean.dtype)
    featsum = jnp.sum(mean, axis=-1)
    occv = (featsum != 0) & valid  # 5D path: gt_mask = sum_C(gt) != 0
    centers = world_centers(coords, grid_shape, pc_range_full, dtype)
    off = (mean[..., :3].astype(dtype)
           - centers * occv[..., None].astype(dtype))
    off = off * valid[..., None].astype(dtype)

    coords = coords.astype(jnp.int32)

    def one(off_r, occ_r, c_r, v_r):
        z = jnp.where(v_r, c_r[:, 0], 0)
        row = jnp.where(v_r, c_r[:, 1] * w + c_r[:, 2], h * w)  # OOB drops
        canvas = jnp.zeros((h * w, d * 3), dtype)
        cols = z[:, None] * 3 + jnp.arange(3, dtype=jnp.int32)[None, :]
        canvas = canvas.at[row[:, None], cols].set(off_r, mode="drop")
        occ = jnp.zeros((h * w, d), dtype)
        occ = occ.at[row, z].set(occ_r.astype(dtype), mode="drop")
        return canvas.reshape(h, w, d * 3), occ.reshape(h, w, d)

    return jax.vmap(one)(off, occv, coords, valid)


def mask_offset_loss_folded(gen_offset_f, gen_mask_f, gt_off_f, occ):
    """Folded-layout mask_offset_loss: gen_offset_f (B,H,W,D*3),
    gen_mask_f (B,H,W,D), targets from ``rasterize_pcr_targets_folded``.
    Identical reductions to the 5D form (pinned in tests/test_pcr_folded.py);
    reference voxelnet.py:171-185."""
    z = occ.astype(gen_mask_f.dtype)
    count_pos = jnp.maximum(jnp.sum(z), 1.0)
    count_neg = jnp.sum(1.0 - z)
    beta = count_neg / count_pos
    bce = beta * z * jax.nn.softplus(-gen_mask_f) \
        + (1.0 - z) * jax.nn.softplus(gen_mask_f)
    loss = jnp.mean(bce)

    ind = (gt_off_f != 0).astype(gen_offset_f.dtype)
    n = jnp.maximum(jnp.sum(ind), 1.0)
    com_loss = jnp.sum(jnp.abs(gen_offset_f - gt_off_f) * ind) / n
    return loss, com_loss


@DETECTORS.register_module
class KD_VoxelNet(nn.Module):
    reader: nn.Module
    backbone: nn.Module
    neck: nn.Module  # S2D_RPN
    bbox_head: nn.Module
    train_cfg: Optional[Any] = None
    test_cfg: Optional[Any] = None
    pretrained: Optional[str] = None
    pc_range_full: Tuple[float, ...] = (-75.2, -75.2, -2.0, 75.2, 75.2, 4.0)

    @nn.compact
    def __call__(self, example, train: bool = False):
        feats = self.reader(
            example["voxels"], example["num_points"], example["coordinates"], train
        )
        bev, _ = self.backbone(feats, example["coordinates"], train)
        (x, gen_offset_2, gen_mask_2, gen_offset_4, gen_mask_4, f_s_a, f_s_b) = (
            self.neck(bev, train)
        )
        preds = self.bbox_head(x, train)
        return {
            "preds": preds,
            "f_s_a": f_s_a,
            "f_s_b": f_s_b,
            "gen_offset_2": gen_offset_2,
            "gen_mask_2": gen_mask_2,
            "gen_offset_4": gen_offset_4,
            "gen_mask_4": gen_mask_4,
        }

    def forward_two_stage(self, example, train: bool = False):
        """(reference voxelnet.py:266-301); PCR generators are skipped at
        eval/frozen first stage by the S2D_RPN train gate."""
        feats = self.reader(
            example["voxels"], example["num_points"], example["coordinates"], train
        )
        bev, _ = self.backbone(feats, example["coordinates"], train)
        x = self.neck(bev, train)[0]
        preds = self.bbox_head(x, train)
        boxes = self.predict(jax.lax.stop_gradient(preds), self.test_cfg)
        return boxes, x, preds

    # pure post-hoc functions (no params) ------------------------------------
    def pcr_loss(self, out, example):
        """(mask_loss, offset_loss) vs the /2 and /4 reconstruction streams.
        PCR outputs are z-folded: gen_offset (B,H,W,D*3), gen_mask (B,H,W,D)."""
        losses = []
        for tag in ("2", "4"):
            go = out[f"gen_offset_{tag}"]
            gm = out[f"gen_mask_{tag}"]
            grid_shape = (gm.shape[3], gm.shape[1], gm.shape[2])  # (D,H,W)
            gt_off, occ = rasterize_pcr_targets_folded(
                example[f"reconstruction_voxels_{tag}"],
                example[f"reconstruction_num_points_{tag}"],
                example[f"reconstruction_coordinates_{tag}"],
                grid_shape, self.pc_range_full, go.dtype,
            )
            losses.append(mask_offset_loss_folded(go, gm, gt_off, occ))
        mask_loss = losses[0][0] + losses[1][0]
        offset_loss = losses[0][1] + losses[1][1]
        return mask_loss, offset_loss

    def loss(self, preds, example):
        if isinstance(self.bbox_head, MultiGroupHead):
            return mg_head_loss(self.bbox_head, preds, example)
        return center_head_loss(
            preds, example,
            weight=self.bbox_head.weight,
            code_weights=self.bbox_head.code_weights,
            dataset=self.bbox_head.dataset,
        )

    def predict(self, preds, test_cfg=None, example=None):
        if isinstance(preds, dict) and "preds" in preds:
            preds = preds["preds"]  # __call__ output dict -> head preds
        cfg = test_cfg if test_cfg is not None else self.test_cfg
        if isinstance(self.bbox_head, MultiGroupHead):
            return mg_head_predict(self.bbox_head, preds, example, cfg)
        return center_head_predict(preds, cfg, self.bbox_head.num_classes)


@DETECTORS.register_module
class KD_PointPillars(nn.Module):
    reader: nn.Module
    backbone: nn.Module  # PointPillarsScatter_S2D
    neck: nn.Module
    bbox_head: nn.Module
    train_cfg: Optional[Any] = None
    test_cfg: Optional[Any] = None
    pretrained: Optional[str] = None
    pc_range_full: Tuple[float, ...] = (-75.2, -75.2, -2.0, 75.2, 75.2, 4.0)

    @nn.compact
    def __call__(self, example, train: bool = False):
        feats = self.reader(
            example["voxels"], example["num_points"], example["coordinates"], train
        )
        f_s_a, f_s_b, gen_offset, gen_mask = self.backbone(
            feats, example["coordinates"], train
        )
        x = self.neck(f_s_a, train)
        preds = self.bbox_head(x, train)
        return {
            "preds": preds,
            "f_s_a": f_s_a,
            "f_s_b": f_s_b,
            "gen_offset": gen_offset,
            "gen_mask": gen_mask,
        }

    def forward_two_stage(self, example, train: bool = False):
        """(reference point_pillars.py:216-...)."""
        feats = self.reader(
            example["voxels"], example["num_points"], example["coordinates"], train
        )
        f_s_a, _, _, _ = self.backbone(feats, example["coordinates"], train)
        x = self.neck(f_s_a, train)
        preds = self.bbox_head(x, train)
        boxes = self.predict(jax.lax.stop_gradient(preds), self.test_cfg)
        return boxes, x, preds

    # pure post-hoc functions (no params) ------------------------------------
    def pcr_loss(self, out, example):
        """Full-resolution depth-1 reconstruction target (reference
        point_pillars.py:176-213; mean of the first 5 point features).
        The pillar PCR emits D=1 NDHWC volumes; fold = squeeze."""
        go = out["gen_offset"][:, 0]        # (B, ny, nx, 3) = folded D=1
        gm = out["gen_mask"][:, 0, :, :, 0]  # (B, ny, nx)
        grid_shape = (1, go.shape[1], go.shape[2])
        gt_off, occ = rasterize_pcr_targets_folded(
            example["reconstruction_voxels"][..., :5],
            example["reconstruction_num_points"],
            example["reconstruction_coordinates"],
            grid_shape, self.pc_range_full, go.dtype,
        )
        return mask_offset_loss_folded(go, gm[..., None], gt_off, occ)

    def loss(self, preds, example):
        if isinstance(self.bbox_head, MultiGroupHead):
            return mg_head_loss(self.bbox_head, preds, example)
        return center_head_loss(
            preds, example,
            weight=self.bbox_head.weight,
            code_weights=self.bbox_head.code_weights,
            dataset=self.bbox_head.dataset,
        )

    def predict(self, preds, test_cfg=None, example=None):
        if isinstance(preds, dict) and "preds" in preds:
            preds = preds["preds"]  # __call__ output dict -> head preds
        cfg = test_cfg if test_cfg is not None else self.test_cfg
        if isinstance(self.bbox_head, MultiGroupHead):
            return mg_head_predict(self.bbox_head, preds, example, cfg)
        return center_head_predict(preds, cfg, self.bbox_head.num_classes)
