"""Two-stage CenterPoint-Pillar (BEV RoI refinement on the frozen baseline), Waymo 20%.

Field-level parity with the reference file configs/waymo/pp/two_stage/waymo_centerpoint_pp_two_pfn_stride1_two_stage_bev_interval_5.py is
asserted by tests/test_config_zoo.py; the shared builders live in
sparse2dense_tpu/zoo.py.
"""
from sparse2dense_tpu.zoo import build

globals().update(build("waymo/pp/two_stage/waymo_centerpoint_pp_two_pfn_stride1_two_stage_bev_interval_5"))
