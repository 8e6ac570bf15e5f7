"""Config-dict -> flax module builders (reference det3d/models/builder.py:16-50).

Accepts the reference's config schema unchanged. Derives static shapes the
torch code discovered at runtime (e.g. the scatter grid) from the config so
everything stays XLA-compatible, and threads an optional ``axis_name`` into
every BatchNorm for cross-device statistic sync (SyncBN equivalent).
"""
from __future__ import annotations

import copy
from typing import Any, Optional

import numpy as np

from ..utils.registry import build_from_cfg
from .registry import (
    BACKBONES,
    DETECTORS,
    HEADS,
    LOSSES,
    NECKS,
    READERS,
    ROI_HEAD,
    SECOND_STAGE,
)

_SUBMODULE_KEYS = ("reader", "backbone", "neck", "bbox_head", "second_stage_modules", "roi_head")


def _clean(cfg: dict, drop=("logger",)) -> dict:
    out = {k: v for k, v in dict(cfg).items() if k not in drop}
    return out


def _as_tuple(x):
    if isinstance(x, (list, tuple)):
        return tuple(_as_tuple(v) for v in x)
    return x


def build_reader(cfg, axis_name=None):
    cfg = _clean(cfg)
    if axis_name is not None and cfg.get("type") == "PillarFeatureNet":
        cfg["axis_name"] = axis_name
    for k in ("num_filters", "voxel_size", "pc_range"):
        if k in cfg:
            cfg[k] = _as_tuple(cfg[k])
    return build_from_cfg(cfg, READERS)


def sparse_shape_from_voxel_cfg(voxel_generator) -> tuple:
    """(D+1, H, W) zyx grid of the sparse backbones — the reference computes
    ``input_shape[::-1] + [1, 0, 0]`` at runtime (scn.py:159); here it is
    static, derived from the voxel_generator config."""
    vg = dict(voxel_generator)
    rng = np.asarray(vg["range"], np.float64)
    vs = np.asarray(vg["voxel_size"], np.float64)
    grid = np.round((rng[3:] - rng[:3]) / vs).astype(int)  # (W, H, D) in xyz
    return (int(grid[2]) + 1, int(grid[1]), int(grid[0]))


def build_backbone(cfg, reader_cfg=None, axis_name=None, voxel_generator=None):
    cfg = _clean(cfg)
    if cfg.get("type", "").startswith("PointPillarsScatter") and reader_cfg is not None:
        vs = reader_cfg["voxel_size"]
        pr = reader_cfg["pc_range"]
        nx = int(round((pr[3] - pr[0]) / vs[0]))
        ny = int(round((pr[4] - pr[1]) / vs[1]))
        cfg.setdefault("grid_shape", (ny, nx))
        cfg.setdefault("num_input_features", reader_cfg.get("num_filters", [64])[-1])
    if cfg.get("type", "").startswith("SpMiddle"):
        cfg.pop("ds_factor", None)
        if voxel_generator is not None:
            cfg.setdefault("sparse_shape", sparse_shape_from_voxel_cfg(voxel_generator))
        if "stage_budgets" in cfg:
            cfg["stage_budgets"] = _as_tuple(cfg["stage_budgets"])
        if "sparse_shape" in cfg:
            cfg["sparse_shape"] = _as_tuple(cfg["sparse_shape"])
    if axis_name is not None:
        cfg["axis_name"] = axis_name
    cfg.pop("ds_factor_kept", None)
    return build_from_cfg(cfg, BACKBONES)


def build_neck(cfg, axis_name=None):
    cfg = _clean(cfg)
    for k in ("layer_nums", "ds_layer_strides", "ds_num_filters", "us_layer_strides", "us_num_filters"):
        if k in cfg:
            cfg[k] = _as_tuple(cfg[k])
    if axis_name is not None:
        cfg["axis_name"] = axis_name
    return build_from_cfg(cfg, NECKS)


def build_head(cfg, axis_name=None):
    cfg = _clean(cfg)
    if "tasks" in cfg:
        cfg["tasks"] = tuple(dict(t) for t in cfg["tasks"])
    if "code_weights" in cfg:
        cfg["code_weights"] = _as_tuple(cfg["code_weights"])
    if "common_heads" in cfg:
        cfg["common_heads"] = tuple(sorted((k, tuple(v)) for k, v in dict(cfg["common_heads"]).items()))
    if axis_name is not None:
        cfg["axis_name"] = axis_name
    return build_from_cfg(cfg, HEADS)


def build_detector(
    cfg,
    train_cfg=None,
    test_cfg=None,
    axis_name: Optional[str] = None,
    voxel_generator=None,
):
    """Build a detector module from a reference-schema config dict.

    ``voxel_generator`` (the config's top-level voxel_generator dict) supplies
    the static sparse grid to 3D backbones; pillar models ignore it.
    """
    cfg = copy.deepcopy(dict(cfg))
    det_type = cfg.get("type")
    if det_type == "TwoStageDetector":
        cfg["single_det"] = build_detector(
            cfg.pop("first_stage_cfg"), train_cfg=train_cfg, test_cfg=test_cfg,
            axis_name=axis_name, voxel_generator=voxel_generator,
        )
        cfg["second_stage"] = tuple(
            build_from_cfg(_freeze_cfg(m), SECOND_STAGE)
            for m in cfg.pop("second_stage_modules")
        )
        rh = _freeze_cfg(cfg.pop("roi_head"))
        if axis_name is not None:
            rh["axis_name"] = axis_name
        cfg["roi_head"] = build_from_cfg(rh, ROI_HEAD)
        cfg["train_cfg"] = _freeze_cfg(train_cfg)
        cfg["test_cfg"] = _freeze_cfg(test_cfg)
        return build_from_cfg(cfg, DETECTORS)
    sub = {}
    reader_cfg = cfg.get("reader")
    if "reader" in cfg:
        sub["reader"] = build_reader(cfg.pop("reader"), axis_name=axis_name)
    if "backbone" in cfg:
        sub["backbone"] = build_backbone(
            cfg.pop("backbone"), reader_cfg=reader_cfg, axis_name=axis_name,
            voxel_generator=voxel_generator,
        )
    if "neck" in cfg:
        sub["neck"] = build_neck(cfg.pop("neck"), axis_name=axis_name)
    if "bbox_head" in cfg:
        sub["bbox_head"] = build_head(cfg.pop("bbox_head"), axis_name=axis_name)

    cfg.update(sub)
    cfg["train_cfg"] = _freeze_cfg(train_cfg)
    cfg["test_cfg"] = _freeze_cfg(test_cfg)
    if det_type in ("KD_VoxelNet", "KD_PointPillars") and voxel_generator is not None:
        cfg.setdefault("pc_range_full", tuple(float(v) for v in voxel_generator["range"]))
    return build_from_cfg(cfg, DETECTORS)


def _freeze_cfg(cfg):
    """Plain nested dict copy so flax module attrs stay simple."""
    if cfg is None:
        return None
    if isinstance(cfg, dict):
        return {k: _freeze_cfg(v) for k, v in cfg.items()}
    if isinstance(cfg, (list, tuple)):
        return tuple(_freeze_cfg(v) for v in cfg)
    if isinstance(cfg, np.generic):
        return cfg.item()
    return cfg
