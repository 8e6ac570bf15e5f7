"""CenterPoint-Pillar dense teacher, Waymo 20%, 6 epochs.

Field-level parity with the reference file configs/waymo/pp/waymo_centerpoint_pp_two_pfn_stride1_3x_dense_interval_5.py is
asserted by tests/test_config_zoo.py; the shared builders live in
sparse2dense_tpu/zoo.py.
"""
from sparse2dense_tpu.zoo import build

globals().update(build("waymo/pp/waymo_centerpoint_pp_two_pfn_stride1_3x_dense_interval_5"))
