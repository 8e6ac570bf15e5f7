from .registry import (READERS, BACKBONES, NECKS, HEADS, LOSSES, DETECTORS,
                       SECOND_STAGE, ROI_HEAD)
from .builder import build_detector

# import submodules for registration side effects
from .readers import pillar_encoder  # noqa: F401
from .backbones import scatter  # noqa: F401
from .backbones import scn  # noqa: F401
from .necks import rpn  # noqa: F401
from .necks import s2d_rpn  # noqa: F401
from .heads import center_head  # noqa: F401
from .heads import mg_head  # noqa: F401
from .detectors import point_pillars  # noqa: F401
from .detectors import voxelnet  # noqa: F401
from .detectors import kd  # noqa: F401
from .detectors import two_stage  # noqa: F401
from .second_stage import bev  # noqa: F401
from .roi_heads import roi_head  # noqa: F401
