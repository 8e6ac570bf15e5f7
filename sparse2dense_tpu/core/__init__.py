from . import center_utils
