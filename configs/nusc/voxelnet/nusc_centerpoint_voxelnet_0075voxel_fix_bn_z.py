"""nuScenes CenterPoint-VoxelNet, 0.075 m voxels, stronger augmentation.

Field-level parity with the reference file configs/nusc/voxelnet/nusc_centerpoint_voxelnet_0075voxel_fix_bn_z.py is
asserted by tests/test_config_zoo.py; the shared builders live in
sparse2dense_tpu/zoo.py.
"""
from sparse2dense_tpu.zoo import build

globals().update(build("nusc/voxelnet/nusc_centerpoint_voxelnet_0075voxel_fix_bn_z"))
