"""Config introspection helpers (reference: det3d/utils/config_tool.py:39)."""
from __future__ import annotations

import math


def get_downsample_factor(model_config) -> int:
    """Net BEV downsample factor of a detector config.

    product(neck ds strides) / last neck upsample stride * backbone ds_factor.
    Two-stage configs nest the detector under ``first_stage_cfg``.
    """
    if "neck" in model_config:
        cfg = model_config
    else:
        cfg = model_config["first_stage_cfg"]
    neck = cfg["neck"]
    factor = 1.0
    for s in neck.get("ds_layer_strides", [1]):
        factor *= s
    us = neck.get("us_layer_strides", [])
    if len(us) > 0:
        factor /= us[-1]
    factor *= cfg["backbone"]["ds_factor"]
    factor = int(factor)
    assert factor > 0, f"invalid downsample factor {factor}"
    return factor
