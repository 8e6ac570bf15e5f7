"""nuScenes CenterPoint-VoxelNet DCN head with double-flip test-time augmentation.

Field-level parity with the reference file configs/nusc/voxelnet/nusc_centerpoint_voxelnet_0075voxel_dcn_flip.py is
asserted by tests/test_config_zoo.py; the shared builders live in
sparse2dense_tpu/zoo.py.
"""
from sparse2dense_tpu.zoo import build

globals().update(build("nusc/voxelnet/nusc_centerpoint_voxelnet_0075voxel_dcn_flip"))
