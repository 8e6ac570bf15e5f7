"""Native host kernels (C++, ctypes-bound).

Build with ``make -C sparse2dense_tpu/csrc`` or ``python -m
sparse2dense_tpu.csrc.build``; consumers fall back to vectorized NumPy when
the library is absent.
"""
import ctypes
import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libs2d_host.so")
_lib = None


def build():
    subprocess.run(["make", "-C", _DIR], check=True)


def load():
    """Load (building on first use if a toolchain is available); returns the
    ctypes library or None."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            build()
        except Exception:
            return None
    try:
        _lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    _lib.points_to_voxel_fcfs.restype = ctypes.c_int64
    return _lib
