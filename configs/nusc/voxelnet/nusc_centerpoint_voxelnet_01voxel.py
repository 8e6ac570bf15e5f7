"""nuScenes CenterPoint-VoxelNet, 0.1 m voxels, 10-sweep input, 20 epochs.

Field-level parity with the reference file configs/nusc/voxelnet/nusc_centerpoint_voxelnet_01voxel.py is
asserted by tests/test_config_zoo.py; the shared builders live in
sparse2dense_tpu/zoo.py.
"""
from sparse2dense_tpu.zoo import build

globals().update(build("nusc/voxelnet/nusc_centerpoint_voxelnet_01voxel"))
