"""Two-stage refinement on the frozen 1x S2D/PCR student.

Field-level parity with the reference file configs/waymo/voxelnet/two_stage/waymo_centerpoint_voxelnet_two_stage_distill.py is
asserted by tests/test_config_zoo.py; the shared builders live in
sparse2dense_tpu/zoo.py.
"""
from sparse2dense_tpu.zoo import build

globals().update(build("waymo/voxelnet/two_stage/waymo_centerpoint_voxelnet_two_stage_distill"))
