"""The de-facto public API: every reference config file must load UNCHANGED
through Config.fromfile and build into a detector module (SURVEY.md §2.7
north star). No forward pass here, build only, so the full 28-config sweep
stays fast."""
import glob
import os

import pytest

from sparse2dense_tpu.utils import Config
from sparse2dense_tpu.models import build_detector

REF = "/root/reference/configs"
ALL_CONFIGS = sorted(glob.glob(os.path.join(REF, "**", "*.py"), recursive=True))
ALL_CONFIGS = [c for c in ALL_CONFIGS if not c.endswith("README.py")]


@pytest.mark.parametrize("path", ALL_CONFIGS, ids=lambda p: os.path.relpath(p, REF))
def test_reference_config_loads_and_builds(path):
    cfg = Config.fromfile(path)
    assert "S_model" in cfg or "model" in cfg
    model_cfg = cfg.get("S_model") or cfg.get("model")
    model = build_detector(
        model_cfg, train_cfg=cfg.get("train_cfg"), test_cfg=cfg.get("test_cfg"),
        voxel_generator=cfg.get("voxel_generator"),
    )
    assert model is not None
    # distillation configs also carry the teacher
    if cfg.get("distillation"):
        teacher = build_detector(
            cfg.model, train_cfg=cfg.get("train_cfg"),
            test_cfg=cfg.get("test_cfg"),
            voxel_generator=cfg.get("voxel_generator"),
        )
        assert teacher is not None
