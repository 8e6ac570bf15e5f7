"""CenterPoint-VoxelNet S2D/PCR distillation student, Waymo full set, 12 epochs.

Field-level parity with the reference file configs/waymo/voxelnet/waymo_centerpoint_voxelnet_1x_distill.py is
asserted by tests/test_config_zoo.py; the shared builders live in
sparse2dense_tpu/zoo.py.
"""
from sparse2dense_tpu.zoo import build

globals().update(build("waymo/voxelnet/waymo_centerpoint_voxelnet_1x_distill"))
