from .registry import Registry, build_from_cfg
from .config import Config, ConfigDict
from .config_tool import get_downsample_factor
