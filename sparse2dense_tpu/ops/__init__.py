from .voxelize import points_to_voxel, VoxelGenerator
