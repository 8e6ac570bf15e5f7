"""Two-stage CenterPoint-VoxelNet (BEV RoI refinement on the frozen baseline), Waymo 20%.

Field-level parity with the reference file configs/waymo/voxelnet/two_stage/waymo_centerpoint_voxelnet_two_stage_interval_5.py is
asserted by tests/test_config_zoo.py; the shared builders live in
sparse2dense_tpu/zoo.py.
"""
from sparse2dense_tpu.zoo import build

globals().update(build("waymo/voxelnet/two_stage/waymo_centerpoint_voxelnet_two_stage_interval_5"))
