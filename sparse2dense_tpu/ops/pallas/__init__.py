"""Pallas TPU kernels (Mosaic-compiled hot paths).

window_kernel: the windowed one-hot sparse-conv main pass
(ops/window_conv.py semantics, fused in VMEM).
"""
