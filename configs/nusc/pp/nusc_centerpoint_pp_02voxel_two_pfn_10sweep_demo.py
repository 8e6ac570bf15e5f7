"""nuScenes CenterPoint-Pillar pointed at the demo mini-dataset.

Field-level parity with the reference file configs/nusc/pp/nusc_centerpoint_pp_02voxel_two_pfn_10sweep_demo.py is
asserted by tests/test_config_zoo.py; the shared builders live in
sparse2dense_tpu/zoo.py.
"""
from sparse2dense_tpu.zoo import build

globals().update(build("nusc/pp/nusc_centerpoint_pp_02voxel_two_pfn_10sweep_demo"))
