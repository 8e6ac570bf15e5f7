"""sparse2dense_tpu: TPU-native rebuild of the Sparse2Dense (NeurIPS 2022)
LiDAR 3D-detection training framework (reference: stevewongv/Sparse2Dense),
built on JAX/XLA/Pallas with static shapes and mesh-based data parallelism."""

__version__ = "0.1.0"
