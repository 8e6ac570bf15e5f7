"""Python-file config system.

Source-compatible with the reference's config files (reference:
det3d/torchie/utils/config.py:51-170): configs are plain ``.py`` files whose
module-level names become the config namespace, with attribute-style access.

Reference config files do ``from det3d.utils.config_tool import get_downsample_factor``.
To let those files load unchanged against this framework, :func:`Config.fromfile`
installs a tiny ``det3d`` shim into ``sys.modules`` (pointing at our own
``config_tool``) before executing the file.
"""
from __future__ import annotations

import importlib.util
import os
import sys
import tempfile
import types
from typing import Any, Dict


class ConfigDict(dict):
    """dict with attribute access, recursively wrapping nested dicts."""

    def __init__(self, *args, **kwargs):
        super().__init__()
        d = dict(*args, **kwargs)
        for k, v in d.items():
            self[k] = self._wrap(v)

    @classmethod
    def _wrap(cls, v):
        if isinstance(v, ConfigDict):
            return v
        if isinstance(v, dict):
            return cls(v)
        if isinstance(v, (list, tuple)):
            return type(v)(cls._wrap(x) for x in v)
        return v

    def __setitem__(self, k, v):
        super().__setitem__(k, self._wrap(v))

    def __setattr__(self, k, v):
        self[k] = v

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __delattr__(self, k):
        try:
            del self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def get(self, k, default=None):
        return super().get(k, default)

    def copy(self):
        return ConfigDict(self)

    def __deepcopy__(self, memo):
        import copy as _copy

        return ConfigDict({k: _copy.deepcopy(dict(v) if isinstance(v, ConfigDict) else v, memo)
                           for k, v in self.items()})


def _install_det3d_shim():
    """Make the det3d modules reference config files import resolvable
    (the complete set across all 28 reference configs:
    det3d.utils.config_tool.get_downsample_factor, det3d.builder.build_box_coder)."""
    if "det3d.builder" in sys.modules and "det3d.utils.config_tool" in sys.modules:
        return
    from . import config_tool as _ct
    from ..core.box_coder import build_box_coder as _bbc

    det3d = sys.modules.get("det3d")
    if det3d is None:
        det3d = types.ModuleType("det3d")
        sys.modules["det3d"] = det3d
    utils_mod = types.ModuleType("det3d.utils")
    shim = types.ModuleType("det3d.utils.config_tool")
    shim.get_downsample_factor = _ct.get_downsample_factor
    utils_mod.config_tool = shim
    det3d.utils = utils_mod
    sys.modules["det3d.utils"] = utils_mod
    sys.modules["det3d.utils.config_tool"] = shim

    builder_mod = types.ModuleType("det3d.builder")
    builder_mod.build_box_coder = _bbc
    det3d.builder = builder_mod
    sys.modules["det3d.builder"] = builder_mod


class Config:
    """Config loaded from a python file; top-level names become entries."""

    def __init__(self, cfg_dict: Dict[str, Any] = None, text: str = "", filename: str = ""):
        self._cfg_dict = ConfigDict(cfg_dict or {})
        self._text = text
        self._filename = filename

    @staticmethod
    def fromfile(filename: str) -> "Config":
        filename = os.path.abspath(os.path.expanduser(filename))
        if not filename.endswith(".py"):
            raise ValueError(f"only .py configs supported, got {filename}")
        if not os.path.isfile(filename):
            raise FileNotFoundError(filename)
        _install_det3d_shim()
        modname = "_s2d_cfg_" + os.path.basename(filename)[:-3]
        spec = importlib.util.spec_from_file_location(modname, filename)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[modname] = mod
        try:
            spec.loader.exec_module(mod)
            cfg_dict = {
                k: v for k, v in mod.__dict__.items()
                if not k.startswith("__") and not isinstance(v, types.ModuleType)
                and not callable(v)
            }
        finally:
            sys.modules.pop(modname, None)
        with open(filename) as f:
            text = f.read()
        return Config(cfg_dict, text=text, filename=filename)

    @property
    def filename(self) -> str:
        return self._filename

    @property
    def text(self) -> str:
        return self._text

    def __getattr__(self, name):
        return getattr(self._cfg_dict, name)

    def __getitem__(self, name):
        return self._cfg_dict[name]

    def __setattr__(self, name, value):
        if name.startswith("_"):
            super().__setattr__(name, value)
        else:
            self._cfg_dict[name] = value

    def __contains__(self, name):
        return name in self._cfg_dict

    def get(self, name, default=None):
        return self._cfg_dict.get(name, default)

    def keys(self):
        return self._cfg_dict.keys()

    def __repr__(self):
        return f"Config(file={self._filename!r}, keys={list(self._cfg_dict)})"
