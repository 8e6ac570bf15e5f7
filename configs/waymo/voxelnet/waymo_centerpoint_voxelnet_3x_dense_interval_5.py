"""CenterPoint-VoxelNet DENSE teacher (trains on densified object points), Waymo 20%, 30 epochs.

Field-level parity with the reference file configs/waymo/voxelnet/waymo_centerpoint_voxelnet_3x_dense_interval_5.py is
asserted by tests/test_config_zoo.py; the shared builders live in
sparse2dense_tpu/zoo.py.
"""
from sparse2dense_tpu.zoo import build

globals().update(build("waymo/voxelnet/waymo_centerpoint_voxelnet_3x_dense_interval_5"))
