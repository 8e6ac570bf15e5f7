"""Pallas TPU kernels for the sep engine's matching levels (placeholder).

The XLA formulation in ops/sepconv.py is exact and differentiable; these
kernels will replace its four permutation row-gathers with windowed one-hot
MXU contractions (the proven layout tricks of ops/pallas/window_kernel.py).
Until then AVAILABLE is False and the engine stays on XLA gathers.
"""
AVAILABLE = False


def expand_plane_pallas(feats, plan):  # pragma: no cover - placeholder
    raise NotImplementedError
