from .registry import (READERS, BACKBONES, NECKS, HEADS, LOSSES, DETECTORS,
                       SECOND_STAGE, ROI_HEAD)
from .builder import build_detector

# import submodules for registration side effects
from .readers import pillar_encoder  # noqa: F401
from .backbones import scatter  # noqa: F401
from .necks import rpn  # noqa: F401
from .heads import center_head  # noqa: F401
from .detectors import point_pillars  # noqa: F401
